"""Scripted policy for window-close-v3 (ref policies/sawyer_window_close_v3_policy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("window-close-v3")
def window_close_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    wndw = o["obj1_pos"] + jnp.array([0.03, -0.03, -0.08])
    desired = select(
        (jnp.linalg.norm(hand[:2] - wndw[:2]) > 0.04, wndw + jnp.array([0.0, 0.0, 0.25])),
        (jnp.abs(hand[2] - wndw[2]) > 0.02, wndw),
        default=wndw + jnp.array([-0.1, 0.0, 0.0]),
    )
    return action(move(hand, desired, p=25.0), jnp.ones(()))
