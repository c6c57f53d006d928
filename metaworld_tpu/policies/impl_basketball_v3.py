"""Scripted policy for basketball-v3 (ref policies/sawyer_basketball_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("basketball-v3")
def basketball_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    ball = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.01])
    hoop = jnp.array([obs[-3], 0.875, 0.35])

    desired = select(
        (jnp.linalg.norm(hand[:2] - ball[:2]) > 0.04, ball + jnp.array([0.0, 0.0, 0.3])),
        (jnp.abs(hand[2] - ball[2]) > 0.025, ball),
        (jnp.abs(ball[2] - hoop[2]) > 0.025,
         jnp.array([1.0, 1.0, 0.0]) * hand + jnp.array([0.0, 0.0, 1.0]) * hoop[2]),
        default=hoop,
    )
    raw = o["obj1_pos"]
    far = (jnp.linalg.norm(hand[:2] - raw[:2]) > 0.04) | (jnp.abs(hand[2] - raw[2]) > 0.15)
    grab = jnp.where(far, -1.0, 0.6)
    return action(move(hand, desired, p=25.0), grab)
