"""Scripted policy for coffee-push-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("coffee-push-v3")
def coffee_push_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    mug = o["obj1_pos"] + jnp.array([0.01, 0.0, 0.05])
    goal = o["goal_pos"]
    desired = select(
        (jnp.linalg.norm(hand[:2] - mug[:2]) > 0.06, mug + jnp.array([0.0, 0.0, 0.2])),
        (jnp.abs(hand[2] - mug[2]) > 0.02, mug),
        default=jnp.array([goal[0], goal[1], 0.1]),
    )
    far = (jnp.linalg.norm(hand[:2] - mug[:2]) > 0.06) | (jnp.abs(hand[2] - mug[2]) > 0.1)
    grab = jnp.where(far, -1.0, 0.5)
    return action(move(hand, desired, p=10.0), grab)
