"""Scripted policy for hammer-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("hammer-v3")
def hammer_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"] + jnp.array([-0.04, 0.0, -0.01])
    goal = jnp.array([0.24, 0.71, 0.11]) + jnp.array([-0.19, 0.0, 0.05])
    desired = select(
        (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.04, puck + jnp.array([0.0, 0.0, 0.1])),
        ((jnp.abs(hand[2] - puck[2]) > 0.05) & (puck[2] < 0.03),
         puck + jnp.array([0.0, 0.0, 0.03])),
        (jnp.linalg.norm(hand[jnp.array([0, 2])] - goal[jnp.array([0, 2])]) > 0.02,
         jnp.array([goal[0], hand[1], goal[2]])),
        default=goal,
    )
    far = (jnp.linalg.norm(hand[:2] - puck[:2]) > 0.04) | (jnp.abs(hand[2] - puck[2]) > 0.1)
    grab = jnp.where(far, 0.0, 0.8)
    return action(move(hand, desired, p=10.0), grab)
