"""Throughput benchmark: MT10, batch 4096, env-steps/s on one chip.

Replaces the reference's scripts/env_runtime.py (MT50 AsyncVectorEnv SPS over
a 20 s window, :88-105) with a jitted lax.scan rollout: the entire horizon
runs on device with zero host round-trips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the 1M env-steps/s/chip north-star target (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 131072
SCAN_STEPS = 250


def build_envs():
    from metaworld_tpu import benchmarks, vector

    bench = benchmarks.MT10(seed=0)
    names = list(bench.train_classes.keys())
    base, rem = divmod(BATCH, len(names))
    counts = [base + (1 if i < rem else 0) for i in range(len(names))]
    return vector.FusedBatchedEnvs(
        specs=[bench.train_classes[n] for n in names],
        counts=counts,
        goal_tables=[bench.goal_table(n) for n in names],
        goal_visible=True,
        one_hot=True,
    )


def main():
    envs = build_envs()
    key = jax.random.PRNGKey(0)
    state, obs = envs.reset(key)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            acts = jax.random.uniform(sub, (envs.num_envs, 4), minval=-1.0, maxval=1.0)
            state, out = envs._step_impl(state, acts)
            return (state, key), out["reward"].sum()

        (state, key), rews = jax.lax.scan(body, (state, key), None, length=SCAN_STEPS)
        return state, rews.sum()

    rollout_jit = jax.jit(rollout, donate_argnums=(0,))

    # compile + warmup
    state, r = rollout_jit(state, key)
    jax.block_until_ready((state, r))

    t0 = time.perf_counter()
    n_rounds = 4
    for i in range(n_rounds):
        state, r = rollout_jit(state, jax.random.PRNGKey(i + 1))
    # block on the full carry, not just the reduced scalar — async dispatch
    # over the device tunnel has been observed to mark the scalar ready early
    jax.block_until_ready((state, r))
    dt = time.perf_counter() - t0

    steps = envs.num_envs * SCAN_STEPS * n_rounds
    sps = steps / dt
    print(json.dumps({
        "metric": "env_steps_per_s_mt10_b131072",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / 1_000_000.0, 3),
    }))


if __name__ == "__main__":
    main()
