"""Multi-device scaling benchmark: env-steps/s vs mesh size.

The reference measures throughput of an AsyncVectorEnv process pool over a
20 s window (ref scripts/env_runtime.py:80-105); here the equivalent scaling
axis is the device mesh — the env batch is sharded over N chips and XLA
inserts the collectives.

On real multi-chip hardware run plain; for a scaling sanity check anywhere:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --cpu --batch 1024 --steps 100

NB virtual CPU devices share the same host cores, so --cpu validates the
sharded program's mechanics (placement, collectives, divisibility), not
speedup; scaling_efficiency is only meaningful on real chips.

Prints one JSON line per mesh size:
    {"devices": N, "envs": B, "steps_per_s": S, "per_device": S/N,
     "scaling_efficiency": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual-device meshes)")
    ap.add_argument("--batch", type=int, default=4096,
                    help="total envs per task-group (divided over devices)")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--bench", default="MT10")
    ap.add_argument("--sizes", default=None,
                    help="comma-separated mesh sizes (default: 1,2,...,max)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import metaworld_tpu as mw
    from metaworld_tpu.parallel import mesh as pmesh

    n_dev = len(jax.devices())
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= n_dev]

    bench = getattr(mw, args.bench)(seed=0) if args.bench.startswith(("MT", "ML")) \
        else mw.MT1(args.bench, seed=0)
    from metaworld_tpu.parallel.sharded import ShardedEnvs

    base = None
    for n in sizes:
        # round the per-task count up so the total env batch divides the mesh
        per_task = max(args.batch // max(len(bench.train_classes), 1), n)
        per_task = -(-per_task // n) * n
        m = pmesh.make_env_mesh(n)
        envs = ShardedEnvs(bench, envs_per_task=per_task, mesh=m)
        state, _ = envs.reset(jax.random.PRNGKey(0))
        acts = pmesh.shard_batch(
            jnp.zeros((envs.num_envs, 4), jnp.float32), m)

        @jax.jit
        def roll(state, acts):
            def body(s, _):
                s, out = envs._step_sm(s, acts)
                return s, out["reward"].sum()

            s, r = jax.lax.scan(body, state, None, length=args.steps)
            return s, r.sum()

        s2, _ = roll(state, acts)           # compile
        jax.block_until_ready(s2)
        t0 = time.perf_counter()
        s3, rs = roll(s2, acts)
        jax.block_until_ready(rs)
        dt = time.perf_counter() - t0
        sps = envs.num_envs * args.steps / dt
        if base is None:
            base = sps / n
        print(json.dumps({
            "devices": n,
            "envs": envs.num_envs,
            "steps_per_s": round(sps),
            "per_device": round(sps / n),
            "scaling_efficiency": round(sps / n / base, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
