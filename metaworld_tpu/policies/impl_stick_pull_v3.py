"""Scripted policy for stick-pull-v3 (ref policies/)."""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.policies import register_policy
from metaworld_tpu.policies.base import action, move, parse_obs, select

@register_policy("stick-pull-v3")
def stick_pull_v3_policy(obs):
    o = parse_obs(obs)
    hand = o["hand_pos"]
    stick = o["obj1_pos"] + jnp.array([-0.015, 0.0, 0.03])
    thermos = o["obj2_pos"] + jnp.array([-0.015, 0.0, 0.03])
    goal = o["goal_pos"] + jnp.array([-0.05, 0.0, 0.0])
    approach = select(
        (jnp.linalg.norm(hand[:2] - stick[:2]) > 0.02, stick + jnp.array([0.0, 0.0, 0.1])),
        (jnp.abs(hand[2] - stick[2]) > 0.02, stick),
        (jnp.abs(stick[1] - thermos[1]) > 0.02,
         jnp.array([stick[0], thermos[1], stick[2]])),
        (jnp.abs(stick[2] - thermos[2]) > 0.02,
         jnp.array([stick[0], thermos[1], thermos[2]])),
        default=thermos,
    )
    desired = select(
        (jnp.abs(stick[0] - thermos[0]) > 0.04, approach),
        default=goal,
    )
    far = (jnp.linalg.norm(hand[:2] - stick[:2]) > 0.02) | (jnp.abs(hand[2] - stick[2]) > 0.1)
    grab = jnp.where(far, -1.0, 0.7)
    return action(move(hand, desired, p=25.0), grab)
