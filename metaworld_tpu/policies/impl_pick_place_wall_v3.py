"""Scripted policy for pick-place-wall-v3 (ref policies/sawyer_pick_place_wall_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("pick-place-wall-v3")
def pick_place_wall_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"] + jnp.array([-0.005, 0.0, 0.0])
    goal = o["goal_pos"]

    in_zone = (-0.15 <= hand[0]) & (hand[0] <= 0.35) & (0.60 <= hand[1]) & (hand[1] <= 0.80)
    goal_leg = select(
        (in_zone & (hand[2] < 0.25), hand + jnp.array([0.0, 0.0, 1.0])),
        (in_zone & (hand[2] < 0.35),
         jnp.array([1.0, 1.0, 0.0]) * goal + jnp.array([0.0, 0.0, 1.0]) * hand[2]),
        (jnp.abs(hand[2] - goal[2]) > 0.01,
         jnp.array([1.0, 1.0, 0.0]) * hand + jnp.array([0.0, 0.0, 1.0]) * goal[2]),
        default=goal,
    )
    desired = select(
        (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.015, puck + jnp.array([0.0, 0.0, 0.1])),
        ((jnp.abs(hand[2] - puck[2]) > 0.04) & (puck[2] < 0.03),
         puck + jnp.array([0.0, 0.0, 0.03])),
        default=goal_leg,
    )
    raw = o["obj1_pos"]
    far = (jnp.linalg.norm(hand[:2] - raw[:2]) > 0.015) | (jnp.abs(hand[2] - raw[2]) > 0.1)
    grab = jnp.where(far, 0.0, 0.9)
    return action(move(hand, desired, p=10.0), grab)
