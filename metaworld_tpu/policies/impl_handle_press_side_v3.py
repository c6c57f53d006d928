"""Scripted policy for handle-press-side-v3 (ref policies/sawyer_handle_press_side_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("handle-press-side-v3")
def handle_press_side_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    button = o["obj1_pos"]
    desired = select(
        (jnp.linalg.norm(hand[:2] - button[:2]) > 0.02, button + jnp.array([0.0, 0.0, 0.2])),
        default=button + jnp.array([0.0, 0.0, -0.5]),
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
