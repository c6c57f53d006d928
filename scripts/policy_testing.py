"""Scripted-policy success sweep: every task x N goals (the reference's
behavioral gold standard, ref tests/.../test_scripted_policies.py asserts
>= 0.80 success per env over its goal set)."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


import jax.numpy as jnp
import numpy as np

from metaworld_tpu import benchmarks
from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset, env_step
from metaworld_tpu.policies import get_policy


def run_task(name: str, n_goals: int = 50, seed: int = 42) -> float:
    spec = registry.get_spec(name)
    policy = get_policy(name)
    bench = benchmarks.MT1(name, seed=seed)
    table = bench.goal_table(name)[:n_goals]

    @jax.jit
    def rollout(rand_vec, key):
        state, obs = env_reset(spec, rand_vec, key, 1.0)

        def body(carry, _):
            state, obs = carry
            state, out = env_step(spec, state, policy(obs))
            return (state, out.obs), out.success

        (_, _), succ = jax.lax.scan(body, (state, obs), None, length=500)
        return jnp.max(succ)

    keys = jax.random.split(jax.random.PRNGKey(0), n_goals)
    succ = jax.vmap(rollout)(jnp.asarray(table), keys)
    return float(jnp.mean(succ))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--goals", type=int, default=50,
                    help="goals per task (the reference bar runs 50, "
                         "ref test_scripted_policies.py:26-35)")
    args = ap.parse_args()
    names = args.names or registry.ALL_V3_ENVIRONMENTS
    results = {}
    for name in names:
        rate = run_task(name, n_goals=args.goals)
        results[name] = rate
        flag = "" if rate >= 0.8 else "  <-- BELOW 0.80"
        print(f"{name}: {rate:.2f}{flag}", flush=True)
    mean = np.mean(list(results.values()))
    n_ok = sum(1 for v in results.values() if v >= 0.8)
    print(f"\nmean success: {mean:.3f}; tasks >= 0.80: {n_ok}/{len(results)}")


if __name__ == "__main__":
    main()
