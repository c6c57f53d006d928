"""Scripted policy for door-close-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("door-close-v3")
def door_close_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    door = o["obj1_pos"] + jnp.array([0.05, 0.12, 0.1])
    goal = o["goal_pos"]
    desired = select(
        ((hand[0] > door[0]) & (hand[2] < door[2] + 0.2),
         jnp.array([hand[0], hand[1], door[2] + 0.25])),
        (hand[0] > door[0], jnp.array([door[0] - 0.02, door[1], hand[2]])),
        (jnp.abs(hand[2] - door[2]) > 0.04, door + jnp.array([-0.02, 0.0, 0.0])),
        default=goal,
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
