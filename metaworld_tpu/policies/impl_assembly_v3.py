"""Scripted policy for assembly-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("assembly-v3")
def assembly_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    wrench = o["obj1_pos"] + jnp.array([-0.02, 0.0, 0.0])
    peg = o["goal_pos"] + jnp.array([0.12, 0.0, 0.14])
    desired = select(
        (jnp.linalg.norm(hand[:2] - wrench[:2]) > 0.02, wrench + jnp.array([0.0, 0.0, 0.1])),
        (jnp.linalg.norm(hand[:2] - peg[:2]) <= 0.02, peg + jnp.array([0.0, 0.0, -0.2])),
        (jnp.abs(hand[2] - wrench[2]) > 0.05, wrench + jnp.array([0.0, 0.0, 0.03])),
        (jnp.abs(hand[2] - peg[2]) > 0.04, jnp.array([hand[0], hand[1], peg[2]])),
        default=peg,
    )
    far = (jnp.linalg.norm(hand[:2] - wrench[:2]) > 0.02) | (jnp.abs(hand[2] - wrench[2]) > 0.12)
    grab = jnp.where(far, 0.0, 0.6)
    return action(move(hand, desired, p=10.0), grab)
