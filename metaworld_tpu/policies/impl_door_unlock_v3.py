"""Scripted policy for door-unlock-v3 (ref policies/sawyer_door_unlock_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("door-unlock-v3")
def door_unlock_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    lock = o["obj1_pos"] + jnp.array([-0.04, -0.02, -0.03])
    desired = select(
        ((jnp.linalg.norm(hand[:2] - lock[:2]) > 0.02) & (hand[2] > 0.15),
         hand + jnp.array([0.0, -0.1, -0.1])),
        (jnp.linalg.norm(hand[:2] - lock[:2]) > 0.02, lock),
        default=lock + jnp.array([0.1, 0.0, 0.01]),
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
