"""Shared helpers for the 50 task modules."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs.core import EvalOut, live_obj_quat
from metaworld_tpu.types import MAX_OBJ, N_EXTRAS


def live_quat(spec, state):
    """Live object quaternions in the task's reference convention
    (core.live_obj_quat) — for custom obs_fns that override positions."""
    return live_obj_quat(spec, state)


def pad_obj_pos(*positions):
    """Stack up to MAX_OBJ object positions, zero-padded."""
    out = jnp.zeros((MAX_OBJ, 3))
    for i, p in enumerate(positions):
        out = out.at[i].set(p)
    return out


def extras_vec(*values):
    """Pack task-specific reset-time scalars into the extras slot."""
    out = jnp.zeros(N_EXTRAS)
    for i, v in enumerate(values):
        out = out.at[i].set(v)
    return out


def sample_until(good_fn, rand_vec, rng, low, high):
    """Rejection-resampling of the reset vector (the reference's
    `while bad: _get_state_rand_vec()` loops, e.g. sawyer_reach_v3.py:127-129).

    Pre-generated benchmark vectors already satisfy `good_fn`, so the loop
    exits immediately for frozen tasks; in seeded/random mode it resamples
    on device."""
    low = jnp.asarray(low)
    high = jnp.asarray(high)

    def cond(carry):
        v, _ = carry
        return jnp.logical_not(good_fn(v))

    def body(carry):
        v, key = carry
        key, sub = jax.random.split(key)
        nv = jax.random.uniform(sub, v.shape, minval=low, maxval=high, dtype=v.dtype)
        return nv, key

    v, _ = jax.lax.while_loop(cond, body, (rand_vec, rng))
    return v


def eval_out(reward, success, near_object=0.0, grasp_success=0.0,
             grasp_reward=0.0, in_place_reward=0.0, obj_to_target=0.0,
             unscaled_reward=None) -> EvalOut:
    f = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return EvalOut(
        reward=f(reward),
        success=f(success),
        near_object=f(near_object),
        grasp_success=f(grasp_success),
        grasp_reward=f(grasp_reward),
        in_place_reward=f(in_place_reward),
        obj_to_target=f(obj_to_target),
        unscaled_reward=f(reward if unscaled_reward is None else unscaled_reward),
    )


def arr(*xs):
    return np.asarray(xs, dtype=np.float64)
