"""Scripted policy for dial-turn-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("dial-turn-v3")
def dial_turn_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    dial = o["obj1_pos"] + jnp.array([0.05, 0.02, 0.09])
    desired = select(
        (jnp.linalg.norm(hand[:2] - dial[:2]) > 0.02,
         jnp.array([dial[0], dial[1], 0.2])),
        (jnp.abs(hand[2] - dial[2]) > 0.02, dial),
        default=dial + jnp.array([-0.05, 0.005, 0.0]),
    )
    return action(move(hand, desired, p=10.0), jnp.ones(()))
