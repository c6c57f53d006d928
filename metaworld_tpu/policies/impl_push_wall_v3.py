"""Scripted policy for push-wall-v3 (ref policies/sawyer_push_wall_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("push-wall-v3")
def push_wall_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    obj = o["obj1_pos"] + jnp.array([-0.005, 0.0, 0.0])
    xy_err = jnp.linalg.norm(hand[:2] - obj[:2])

    wall_block = (-0.1 <= obj[0]) & (obj[0] <= 0.3) & (0.65 <= obj[1]) & (obj[1] <= 0.75)
    wall_side = (
        ((-0.15 < obj[0]) & (obj[0] < 0.05)) | ((0.15 < obj[0]) & (obj[0] < 0.35))
    ) & (0.695 <= obj[1]) & (obj[1] <= 0.755)
    goal_leg = select(
        (wall_block, hand + jnp.array([-1.0, 0.0, 0.0])),
        (wall_side, hand + jnp.array([0.0, 1.0, 0.0])),
        default=o["goal_pos"],
    )
    desired = select(
        (xy_err > 0.02, obj + jnp.array([0.0, 0.0, 0.2])),
        (jnp.abs(hand[2] - obj[2]) > 0.04, obj + jnp.array([0.0, 0.0, 0.03])),
        default=goal_leg,
    )
    far = (jnp.linalg.norm(hand[:2] - o["obj1_pos"][:2]) > 0.02) | (
        jnp.abs(hand[2] - o["obj1_pos"][2]) > 0.1
    )
    grab = jnp.where(far, 0.0, 0.6)
    return action(move(hand, desired, p=10.0), grab)
