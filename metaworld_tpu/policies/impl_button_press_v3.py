"""Scripted policy for button-press-v3 (ref policies/sawyer_button_press_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("button-press-v3")
def button_press_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    button = o["obj1_pos"] + jnp.array([0.0, 0.0, -0.07])
    aligned = (jnp.abs(hand[0] - button[0]) <= 0.02) & (jnp.abs(hand[2] - button[2]) <= 0.02)
    desired = select(
        (~aligned, jnp.array([button[0], hand[1] - 0.1, button[2]])),
        default=button + jnp.array([0.0, 0.02, 0.0]),
    )
    return action(move(hand, desired, p=25.0), jnp.zeros(()))
