"""Scripted policy for plate-slide-v3 (ref policies/sawyer_plate_slide_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("plate-slide-v3")
def plate_slide_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"] + jnp.array([0.0, -0.055, 0.03])
    shelf_x = obs[-3]
    desired = select(
        (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.03, puck + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - puck[2]) > 0.04, puck),
        default=jnp.array([shelf_x, 0.9, puck[2]]),
    )
    return action(move(hand, desired, p=10.0), -jnp.ones(()))
