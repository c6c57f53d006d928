"""Scripted policy for sweep-v3 (ref policies/sawyer_sweep_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("sweep-v3")
def sweep_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    cube = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.015])
    goal = o["goal_pos"]
    xy_err = jnp.linalg.norm(hand[:2] - cube[:2])
    desired = select(
        ((hand[0] < 0.2) & (xy_err > 0.04), cube + jnp.array([0.0, 0.0, 0.3])),
        ((hand[0] < 0.2) & (jnp.abs(hand[2] - cube[2]) > 0.04), cube),
        default=goal + jnp.array([0.0, 0.0, 0.1]),
    )
    raw = o["obj1_pos"]
    far = (jnp.linalg.norm(hand[:2] - raw[:2]) > 0.04) | (jnp.abs(hand[2] - raw[2]) > 0.15)
    grab = select(
        (far, -1.0),
        (raw[0] < 0.4, 0.7),
        default=-1.0,
    )
    return action(move(hand, desired, p=25.0), grab)
