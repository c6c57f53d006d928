"""Scripted policy for button-press-topdown-v3 (ref policies/sawyer_button_press_topdown_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("button-press-topdown-v3")
def button_press_topdown_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    button = o["obj1_pos"]
    desired = select(
        (jnp.linalg.norm(hand[:2] - button[:2]) > 0.04, button + jnp.array([0.0, 0.0, 0.1])),
        default=button,
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
