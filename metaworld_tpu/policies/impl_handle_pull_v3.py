"""Scripted policy for handle-pull-v3 (ref policies/sawyer_handle_pull_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("handle-pull-v3")
def handle_pull_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    handle = o["obj1_pos"] + jnp.array([0.0, -0.04, 0.0])
    # NB the reference returns the scalar handle z (broadcast) in the middle
    # branch (sawyer_handle_pull_v3_policy.py) — kept verbatim
    desired = select(
        (jnp.linalg.norm(hand[:2] - handle[:2]) > 0.02, handle),
        (jnp.abs(hand[2] - handle[2]) > 0.02, jnp.full(3, handle[2])),
        default=handle + jnp.array([0.0, 0.0, 0.1]),
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
