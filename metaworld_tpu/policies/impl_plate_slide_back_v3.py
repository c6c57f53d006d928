"""Scripted policy for plate-slide-back-v3 (ref policies/sawyer_plate_slide_back_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("plate-slide-back-v3")
def plate_slide_back_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"] + jnp.array([0.0, -0.065, 0.025])
    desired = select(
        (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.01, puck + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - puck[2]) > 0.04, puck),
        (hand[1] > 0.7, hand + jnp.array([0.0, -0.1, 0.0])),
        (hand[1] > 0.6, jnp.array([0.15, 0.55, hand[2]])),
        default=jnp.array([hand[0] - 0.1, 0.55, hand[2]]),
    )
    return action(move(hand, desired, p=10.0), -jnp.ones(()))
