"""Memory profile: bytes per env slot, device buffers, host RSS.

The reference budgets < 250 MB per env process and < 60 MB average (ref
tests/integration/test_memory_usage.py:40-49, scripts/profile_memory_usage.py)
because every env is a full MuJoCo instance in its own OS process. Here an
env instance is a few hundred floats in a batched pytree; this script prints
the actual footprint so the contrast is auditable.

    python scripts/profile_memory.py --bench MT10 --envs-per-task 512
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def _tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "size"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="MT10")
    ap.add_argument("--envs-per-task", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import metaworld_tpu as mw

    bench = getattr(mw, args.bench)(seed=0) if args.bench.startswith(("MT", "ML")) \
        else mw.MT1(args.bench, seed=0)
    envs = mw.vector.from_benchmark(bench, envs_per_task=args.envs_per_task)
    state, obs = envs.reset(jax.random.PRNGKey(0))
    state, out = envs.step(state, np.zeros((envs.num_envs, 4)))
    jax.block_until_ready(out["obs"])

    state_b = _tree_bytes(state)
    obs_b = _tree_bytes(out)
    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    rss = None
    try:
        rss = int(open("/proc/self/status").read()
                  .split("VmRSS:")[1].split()[0]) * 1024
    except Exception:
        pass

    print(json.dumps({
        "num_envs": envs.num_envs,
        "state_bytes": state_b,
        "step_out_bytes": obs_b,
        "bytes_per_env": round((state_b + obs_b) / envs.num_envs),
        "device_bytes_in_use": stats.get("bytes_in_use"),
        "host_rss_bytes": rss,
        "ref_budget_bytes_per_env": 250 * 2**20,
    }))


if __name__ == "__main__":
    main()
