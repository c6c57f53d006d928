"""Scripted policy for soccer-v3 (ref policies/sawyer_soccer_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("soccer-v3")
def soccer_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    ball = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.03])
    goal = o["goal_pos"]

    desired_z = jnp.where(jnp.linalg.norm(hand[:2] - ball[:2]) < 0.02, 0.1, 0.03)
    left = ball[0] - goal[0] < -0.05
    right = ball[0] - goal[0] > 0.05
    offset = 0.03
    push = select(
        (left, ball + jnp.array([-offset, 0.0, 0.0])),
        (right, ball + jnp.array([offset, 0.0, 0.0])),
        default=ball + jnp.array([0.0, -offset, 0.0]),
    )
    push = push.at[2].set(desired_z)
    desired = select(
        (jnp.linalg.norm(hand - push) > 0.01, push),
        default=ball,
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
