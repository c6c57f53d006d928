"""Scripted policy for push-back-v3 (ref policies/sawyer_push_back_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("push-back-v3")
def push_back_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"]
    xy_err = jnp.linalg.norm(hand[:2] - puck[:2])
    desired = select(
        (xy_err > 0.04, puck + jnp.array([0.0, 0.0, 0.3])),
        (jnp.abs(hand[2] - puck[2]) > 0.055, puck),
        default=o["goal_pos"] + jnp.array([0.0, 0.0, 1.0]) * hand[2],
    )
    far = (xy_err > 0.04) | (jnp.abs(hand[2] - puck[2]) > 0.05)
    grab = jnp.where(far, 0.0, 0.9)
    return action(move(hand, desired, p=10.0), grab)
