"""Scripted-policy base helpers.

Functional counterparts of the reference's Policy ABC machinery
(ref metaworld/policies/policy.py:33-83, action.py:9-39): a policy here is a
pure function obs(39,) -> action(4,), fully branchless (jnp.where cascades
replace the reference's if/elif state machines) so the whole policy bank
vmaps/jits on device. These policies are the behavioral parity oracle: they
must reproduce the reference policies' actions bit-closely on reference
observations.
"""

from __future__ import annotations

import jax.numpy as jnp


def move(from_xyz, to_xyz, p):
    """P-controller response (ref policy.py:33-53); the env clips to [-1,1]."""
    return p * (to_xyz - from_xyz)


def action(delta_pos, grab_effort):
    return jnp.concatenate([delta_pos, jnp.asarray(grab_effort)[None]])


def parse_obs(obs):
    """Standard slices of the 39-dim observation."""
    return {
        "hand_pos": obs[:3],
        "gripper": obs[3],
        "obj1_pos": obs[4:7],
        "obj1_quat": obs[7:11],
        "obj2_pos": obs[11:14],
        "obj2_quat": obs[14:18],
        "goal_pos": obs[-3:],
    }


def select(*cases, default):
    """Branchless if/elif cascade: cases are (condition, value) pairs
    evaluated top-down like the reference's python if-chains."""
    out = default
    for cond, value in reversed(cases):
        out = jnp.where(cond, value, out)
    return out
