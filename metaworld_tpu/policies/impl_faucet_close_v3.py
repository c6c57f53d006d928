"""Scripted policy for faucet-close-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("faucet-close-v3")
def faucet_close_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    faucet = o["obj1_pos"] + jnp.array([0.04, 0.0, 0.03])
    desired = select(
        (jnp.linalg.norm(hand[:2] - faucet[:2]) > 0.04, faucet + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - faucet[2]) > 0.04, faucet),
        default=faucet + jnp.array([-0.1, 0.05, 0.0]),
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
