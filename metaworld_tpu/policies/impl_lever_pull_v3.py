"""Scripted policy for lever-pull-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("lever-pull-v3")
def lever_pull_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    lever = o["obj1_pos"] + jnp.array([0.0, -0.055, 0.0])
    desired = select(
        (jnp.linalg.norm(hand[:2] - lever[:2]) > 0.02, lever + jnp.array([0.0, 0.0, -0.1])),
        (jnp.abs(hand[2] - lever[2]) > 0.02, lever),
        default=lever + jnp.array([0.0, 0.08, 0.02]),
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
