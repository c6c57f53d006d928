"""Scripted policy for peg-unplug-side-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("peg-unplug-side-v3")
def peg_unplug_side_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    peg = o["obj1_pos"] + jnp.array([-0.02, 0.0, 0.035])
    desired = select(
        (jnp.linalg.norm(hand[:2] - peg[:2]) > 0.04, peg + jnp.array([0.0, 0.0, 0.2])),
        (jnp.abs(hand[2] - 0.15) > 0.02, jnp.array([peg[0], peg[1], 0.15])),
        default=hand + jnp.array([0.01, 0.0, 0.0]),
    )
    far = (jnp.linalg.norm(hand[:2] - peg[:2]) > 0.04) | (jnp.abs(hand[2] - peg[2]) > 0.15)
    grab = jnp.where(far, -1.0, 0.1)
    return action(move(hand, desired, p=25.0), grab)
