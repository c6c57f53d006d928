"""Scripted policy for button-press-wall-v3 (ref policies/sawyer_button_press_wall_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select


@register_policy("button-press-wall-v3")
def button_press_wall_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    button = o["obj1_pos"] + jnp.array([0.0, 0.0, 0.04])
    desired = select(
        (jnp.abs(hand[0] - button[0]) > 0.02, jnp.array([button[0], hand[1], 0.3])),
        (button[1] - hand[1] > 0.09, jnp.array([button[0], button[1], 0.3])),
        (jnp.abs(hand[2] - button[2]) > 0.02, button + jnp.array([0.0, -0.05, 0.0])),
        default=button + jnp.array([0.0, -0.02, 0.0]),
    )
    far = (
        (jnp.abs(hand[0] - button[0]) > 0.02)
        | (button[1] - hand[1] > 0.09)
        | (jnp.abs(hand[2] - button[2]) > 0.02)
    )
    grab = jnp.where(far, 1.0, -1.0)
    return action(move(hand, desired, p=15.0), grab)
