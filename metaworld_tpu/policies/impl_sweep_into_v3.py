"""Scripted policy for sweep-into-v3 (ref policies/sawyer_sweep_into_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("sweep-into-v3")
def sweep_into_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    cube = o["obj1_pos"] + jnp.array([-0.005, 0.0, 0.01])
    xy_err = jnp.linalg.norm(hand[:2] - cube[:2])
    desired = select(
        (xy_err > 0.04, cube + jnp.array([0.0, 0.0, 0.3])),
        (jnp.abs(hand[2] - cube[2]) > 0.04, cube),
        default=o["goal_pos"],
    )
    raw = o["obj1_pos"]
    far = (jnp.linalg.norm(hand[:2] - raw[:2]) > 0.04) | (jnp.abs(hand[2] - raw[2]) > 0.15)
    grab = jnp.where(far, -1.0, 0.7)
    return action(move(hand, desired, p=25.0), grab)
