"""Scripted policy for handle-pull-side-v3 (ref policies/sawyer_handle_pull_side_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("handle-pull-side-v3")
def handle_pull_side_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    handle = o["obj1_pos"]
    desired = select(
        (jnp.linalg.norm(hand[:2] - handle[:2]) > 0.04, handle + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - handle[2]) > 0.03, handle),
        default=handle + jnp.array([0.0, 0.0, 1.0]),
    )
    far = (jnp.linalg.norm(hand[:2] - handle[:2]) > 0.04) | (jnp.abs(hand[2] - handle[2]) > 0.04)
    grab = jnp.where(far, 0.0, 0.6)
    return action(move(hand, desired, p=25.0), grab)
