"""Scripted policy for drawer-close-v3 (ref policies/sawyer_drawer_close_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("drawer-close-v3")
def drawer_close_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    drwr = o["obj1_pos"] + jnp.array([0.0, 0.0, -0.02])
    desired = select(
        ((hand[1] > drwr[1]) & (hand[2] < drwr[2] + 0.23),
         jnp.array([hand[0], hand[1], drwr[2] + 0.5])),
        (hand[1] > drwr[1], drwr + jnp.array([0.0, -0.075, 0.23])),
        (jnp.abs(hand[2] - drwr[2]) > 0.04, drwr + jnp.array([0.0, -0.075, 0.0])),
        default=drwr,
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
