"""Scripted policy for box-close-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("box-close-v3")
def box_close_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    lid = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.02])
    box = jnp.array([o["goal_pos"][0], o["goal_pos"][1], 0.15])
    desired = select(
        (jnp.linalg.norm(hand[:2] - lid[:2]) > 0.01, jnp.array([lid[0], lid[1], 0.2])),
        (jnp.abs(hand[2] - lid[2]) > 0.05, lid),
        (jnp.abs(hand[2] - box[2]) > 0.04, jnp.array([hand[0], hand[1], box[2]])),
        default=box,
    )
    far = (jnp.linalg.norm(hand[:2] - lid[:2]) > 0.01) | (jnp.abs(hand[2] - lid[2]) > 0.13)
    grab = jnp.where(far, 0.5, 1.0)
    return action(move(hand, desired, p=25.0), grab)
