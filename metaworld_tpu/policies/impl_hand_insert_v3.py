"""Scripted policy for hand-insert-v3 (ref policies/sawyer_hand_insert_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("hand-insert-v3")
def hand_insert_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    obj = o["obj1_pos"]
    goal = o["goal_pos"]
    desired = select(
        (jnp.linalg.norm(hand[:2] - obj[:2]) > 0.02, obj + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - obj[2]) > 0.05, obj + jnp.array([0.0, 0.0, 0.03])),
        (jnp.linalg.norm(hand[:2] - goal[:2]) > 0.04,
         jnp.array([1.0, 1.0, 0.0]) * goal + jnp.array([0.0, 0.0, 1.0]) * hand[2]),
        default=goal,
    )
    far = (jnp.linalg.norm(hand[:2] - obj[:2]) > 0.02) | (jnp.abs(hand[2] - obj[2]) > 0.1)
    grab = jnp.where(far, 0.0, 0.65)
    return action(move(hand, desired, p=10.0), grab)
