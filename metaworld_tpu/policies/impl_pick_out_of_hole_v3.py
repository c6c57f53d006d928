"""Scripted policy for pick-out-of-hole-v3 (ref policies/sawyer_pick_out_of_hole_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("pick-out-of-hole-v3")
def pick_out_of_hole_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.02])
    goal = o["goal_pos"]
    desired = select(
        (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.02, puck + jnp.array([0.0, 0.0, 0.15])),
        (jnp.abs(hand[2] - puck[2]) > 0.01, puck),
        (jnp.abs(hand[2] - goal[2]) > 0.04,
         jnp.array([1.0, 1.0, 0.0]) * hand + jnp.array([0.0, 0.0, 1.0]) * goal[2]),
        default=goal,
    )
    far = (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.02) | (jnp.abs(hand[2] - puck[2]) > 0.15)
    grab = jnp.where(far, 0.0, 0.1)
    return action(move(hand, desired, p=25.0), grab)
