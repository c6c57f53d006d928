"""Scripted policy for disassemble-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("disassemble-v3")
def disassemble_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    wrench = o["obj1_pos"] + jnp.array([-0.02, 0.0, 0.01])
    desired = select(
        (jnp.linalg.norm(hand[:2] - wrench[:2]) > 0.02, wrench + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - wrench[2]) > 0.03, wrench),
        default=hand + jnp.array([0.0, 0.0, 0.1]),
    )
    far = (jnp.linalg.norm(hand[:2] - wrench[:2]) > 0.02) | (jnp.abs(hand[2] - wrench[2]) > 0.07)
    grab = jnp.where(far, 0.0, 0.8)
    return action(move(hand, desired, p=10.0), grab)
