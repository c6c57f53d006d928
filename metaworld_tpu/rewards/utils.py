"""Reward-shaping primitives (dm_control-style), rewritten for JAX.

Behavioral contract mirrors the reference's metaworld/utils/reward_utils.py
(tolerance :97-144, _sigmoids :27-94, hamacher_product :222-244,
rect_prism_tolerance :186-219, inverse_tolerance :147-183), but everything here
is branchless, fully batched, and differentiable: sigmoids are selected
statically (compile-time), all data-dependent branches are jnp.where selects,
and margins/bounds may be traced arrays (they vary per env instance under
vmap, unlike the reference where they are python floats).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

# Output of tolerance() at `margin` distance from the bounds interval.
_DEFAULT_VALUE_AT_MARGIN = 0.1

_EPS = 0.0  # exact semantics; guards use explicit where-selects instead


def _gaussian(x, value_at_1):
    scale = math.sqrt(-2.0 * math.log(value_at_1))
    return jnp.exp(-0.5 * jnp.square(x * scale))


def _hyperbolic(x, value_at_1):
    scale = math.acosh(1.0 / value_at_1)
    return 1.0 / jnp.cosh(x * scale)


def _long_tail(x, value_at_1):
    scale = math.sqrt(1.0 / value_at_1 - 1.0)
    return 1.0 / (jnp.square(x * scale) + 1.0)


def _reciprocal(x, value_at_1):
    scale = 1.0 / value_at_1 - 1.0
    return 1.0 / (jnp.abs(x) * scale + 1.0)


def _cosine(x, value_at_1):
    scale = math.acos(2.0 * value_at_1 - 1.0) / math.pi
    scaled = x * scale
    return jnp.where(jnp.abs(scaled) < 1.0, (1.0 + jnp.cos(math.pi * scaled)) / 2.0, 0.0)


def _linear(x, value_at_1):
    scale = 1.0 - value_at_1
    scaled = x * scale
    return jnp.where(jnp.abs(scaled) < 1.0, 1.0 - scaled, 0.0)


def _quadratic(x, value_at_1):
    scale = math.sqrt(1.0 - value_at_1)
    scaled = x * scale
    return jnp.where(jnp.abs(scaled) < 1.0, 1.0 - jnp.square(scaled), 0.0)


def _tanh_squared(x, value_at_1):
    scale = math.atanh(math.sqrt(1.0 - value_at_1))
    return 1.0 - jnp.square(jnp.tanh(x * scale))


SIGMOIDS: dict[str, Callable] = {
    "gaussian": _gaussian,
    "hyperbolic": _hyperbolic,
    "long_tail": _long_tail,
    "reciprocal": _reciprocal,
    "cosine": _cosine,
    "linear": _linear,
    "quadratic": _quadratic,
    "tanh_squared": _tanh_squared,
}


def sigmoid(x, value_at_1: float, kind: str):
    """Maps x to (0, 1], equal to 1 at x == 0 and `value_at_1` at |x| == 1.

    `kind` and `value_at_1` are static (compile-time); x may be any array.
    """
    if kind in ("cosine", "linear", "quadratic"):
        if not 0 <= value_at_1 < 1:
            raise ValueError(f"`value_at_1` must be in [0, 1), got {value_at_1}.")
    else:
        if not 0 < value_at_1 < 1:
            raise ValueError(f"`value_at_1` must be in (0, 1), got {value_at_1}.")
    try:
        fn = SIGMOIDS[kind]
    except KeyError:
        raise ValueError(f"Unknown sigmoid type {kind!r}.") from None
    return fn(x, value_at_1)


_apply_sigmoid = sigmoid


def tolerance(
    x,
    bounds=(0.0, 0.0),
    margin=0.0,
    sigmoid: str = "gaussian",
    value_at_margin: float = _DEFAULT_VALUE_AT_MARGIN,
):
    """1.0 inside `bounds`, decaying sigmoidally outside over `margin`.

    Unlike the reference (reward_utils.py:97-144), `bounds` and `margin` may be
    traced arrays (per-env values under vmap); margin == 0 elements degrade to
    the hard indicator, guarded against division by zero.
    """
    kind = sigmoid
    lower, upper = bounds
    x = jnp.asarray(x)
    in_bounds = jnp.logical_and(lower <= x, x <= upper)
    margin = jnp.asarray(margin, dtype=x.dtype if x.dtype.kind == "f" else jnp.float64)
    safe_margin = jnp.where(margin == 0.0, 1.0, margin)
    d = jnp.where(x < lower, lower - x, x - upper) / safe_margin
    soft = _apply_sigmoid(d, value_at_margin, kind)
    value = jnp.where(
        margin == 0.0,
        jnp.where(in_bounds, 1.0, 0.0),
        jnp.where(in_bounds, 1.0, soft),
    )
    return value


def inverse_tolerance(x, bounds=(0.0, 0.0), margin=0.0, sigmoid: str = "reciprocal"):
    """0 inside bounds, rising toward 1 outside (reference reward_utils.py:147-183)."""
    bound = tolerance(x, bounds=bounds, margin=margin, sigmoid=sigmoid, value_at_margin=0)
    return 1.0 - bound


def rect_prism_tolerance(curr, zero, one):
    """Scaled reward if `curr` lies in the axis-aligned prism spanned by
    zero..one; 1.0 outside (reference reward_utils.py:186-219)."""
    lo = jnp.minimum(zero, one)
    hi = jnp.maximum(zero, one)
    in_prism = jnp.all(jnp.logical_and(lo <= curr, curr <= hi))
    diff = one - zero
    scale = (curr - zero) / diff
    return jnp.where(in_prism, scale[0] * scale[1] * scale[2], 1.0)


def hamacher_product(a, b):
    """Hamacher t-norm: a*b / (a + b - a*b), 0 when the denominator is 0
    (reference reward_utils.py:222-244)."""
    denom = a + b - a * b
    return jnp.where(denom > 0.0, (a * b) / jnp.where(denom > 0.0, denom, 1.0), 0.0)
