"""Scripted policy for door-open-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("door-open-v3")
def door_open_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    door = o["obj1_pos"] + jnp.array([-0.05, 0.0, 0.0])
    desired = select(
        (jnp.linalg.norm(hand[:2] - door[:2]) > 0.12, door + jnp.array([0.06, 0.02, 0.2])),
        (jnp.abs(hand[2] - door[2]) > 0.04, door + jnp.array([0.06, 0.02, 0.0])),
        default=door,
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
