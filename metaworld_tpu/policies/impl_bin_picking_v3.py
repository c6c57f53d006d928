"""Scripted policy for bin-picking-v3 (ref policies/sawyer_bin_picking_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("bin-picking-v3")
def bin_picking_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    cube = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.03])
    # pretend the cube is centered in the bin along y so the fingers don't
    # catch the bin wall (ref comment)
    cube = cube.at[1].set(jnp.clip(cube[1], 0.675, 0.725))
    pos_bin = jnp.array([0.12, 0.7, 0.02])

    desired = select(
        (jnp.linalg.norm(hand[:2] - cube[:2]) > 0.02, cube + jnp.array([0.0, 0.0, 0.15])),
        (jnp.abs(hand[2] - cube[2]) > 0.01, cube),
        (
            (jnp.linalg.norm(hand[:2] - pos_bin[:2]) > 0.02) & (hand[2] < 0.15),
            hand + jnp.array([0.0, 0.0, 0.1]),
        ),
        (jnp.linalg.norm(hand[:2] - pos_bin[:2]) > 0.02,
         jnp.array([pos_bin[0], pos_bin[1], 0.18])),
        default=pos_bin,
    )
    far = (jnp.linalg.norm(hand[:2] - cube[:2]) > 0.02) | (jnp.abs(hand[2] - cube[2]) > 0.02)
    grab = jnp.where(far, -1.0, 0.6)
    return action(move(hand, desired, p=25.0), grab)
