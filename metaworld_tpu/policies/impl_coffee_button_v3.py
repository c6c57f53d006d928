"""Scripted policy for coffee-button-v3 (ref policies/sawyer_coffee_button_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("coffee-button-v3")
def coffee_button_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    button = o["obj1_pos"] + jnp.array([0.0, 0.0, -0.07])
    xz = jnp.linalg.norm(hand[jnp.array([0, 2])] - button[jnp.array([0, 2])])
    desired = select(
        (xz > 0.02, jnp.array([button[0], hand[1], button[2]])),
        default=button + jnp.array([0.0, 0.2, 0.0]),
    )
    return action(move(hand, desired, p=10.0), -jnp.ones(()))
