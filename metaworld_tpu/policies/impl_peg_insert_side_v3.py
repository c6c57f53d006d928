"""Scripted policy for peg-insert-side-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("peg-insert-side-v3")
def peg_insert_side_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    peg = o["obj1_pos"]
    hole = jnp.array([-0.35, o["goal_pos"][1], 0.16])
    desired = select(
        (jnp.linalg.norm(hand[:2] - peg[:2]) > 0.04, peg + jnp.array([0.0, 0.0, 0.3])),
        (jnp.abs(hand[2] - peg[2]) > 0.025, peg),
        (jnp.linalg.norm(peg[1:] - hole[1:]) > 0.03, hole + jnp.array([0.4, 0.0, 0.0])),
        default=hole,
    )
    far = (jnp.linalg.norm(hand[:2] - peg[:2]) > 0.04) | (jnp.abs(hand[2] - peg[2]) > 0.15)
    grab = jnp.where(far, -1.0, 0.6)
    return action(move(hand, desired, p=25.0), grab)
