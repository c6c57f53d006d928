"""Scripted policy for shelf-place-v3 (ref policies/sawyer_shelf_place_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("shelf-place-v3")
def shelf_place_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    block = o["obj1_pos"] + jnp.array([-0.005, 0.0, 0.015])
    shelf_x = obs[-3]

    desired = select(
        (jnp.linalg.norm(hand[:2] - block[:2]) > 0.04, block + jnp.array([0.0, 0.0, 0.3])),
        (jnp.abs(hand[2] - block[2]) > 0.04, block),
        (jnp.abs(hand[0] - shelf_x) > 0.02, jnp.array([shelf_x, hand[1], 0.3])),
        (hand[2] < 0.30, hand + jnp.array([0.0, 0.0, 0.30])),
        default=hand + jnp.array([0.0, 0.05, 0.0]),
    )
    raw = o["obj1_pos"]
    far = (jnp.linalg.norm(hand[:2] - raw[:2]) > 0.04) | (jnp.abs(hand[2] - raw[2]) > 0.15)
    grab = jnp.where(far, -1.0, 0.7)
    return action(move(hand, desired, p=25.0), grab)
