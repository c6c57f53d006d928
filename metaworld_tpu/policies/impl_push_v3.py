"""Scripted policy for push-v3 (ref policies/sawyer_push_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("push-v3")
def push_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    puck = o["obj1_pos"] + jnp.array([-0.005, 0.0, 0.0])
    xy_err = jnp.linalg.norm(hand[:2] - puck[:2])
    desired = select(
        (xy_err > 0.02, puck + jnp.array([0.0, 0.0, 0.2])),
        (jnp.abs(hand[2] - puck[2]) > 0.04, puck + jnp.array([0.0, 0.0, 0.03])),
        default=o["goal_pos"],
    )
    far = (jnp.linalg.norm(hand[:2] - o["obj1_pos"][:2]) > 0.02) | (
        jnp.abs(hand[2] - o["obj1_pos"][2]) > 0.10
    )
    grab = jnp.where(far, 0.0, 0.6)
    return action(move(hand, desired, p=10.0), grab)
