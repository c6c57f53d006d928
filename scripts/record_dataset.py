"""Record an offline dataset: scripted-expert rollouts -> native async store.

The device step loop pushes transition batches into the C++ ring buffer
(metaworld_tpu/native): a background thread does the disk IO, so stepping
never blocks on writes — the TPU-native analogue of the reference users'
pickle-per-episode collection scripts.

    python scripts/record_dataset.py --envs reach-v3 drawer-open-v3 \
        --episodes 2 --out /tmp/mw_dataset.ts --cpu
    python scripts/record_dataset.py --replay /tmp/mw_dataset.ts
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", nargs="+", default=["reach-v3"])
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--envs-per-task", type=int, default=8)
    ap.add_argument("--out", default="/tmp/mw_dataset.ts")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--replay", default=None,
                    help="read a recorded file back and print its contents")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from metaworld_tpu.native import TrajectoryReader, TrajectoryWriter

    if args.replay:
        n, keys, steps = 0, None, 0
        for rec in TrajectoryReader(args.replay):
            if keys is None:
                keys = sorted(rec)
            steps += rec["reward"].shape[0]
            n += 1
        print(f"{args.replay}: {n} chunks, {steps} batch-steps, keys={keys}")
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import metaworld_tpu as mw
    from metaworld_tpu.evaluation import ScriptedAgent

    envs = mw.vector.from_benchmark(
        mw.benchmarks._mt(args.envs, seed=0),
        envs_per_task=args.envs_per_task)
    agent = ScriptedAgent(envs)

    t0 = time.time()
    with TrajectoryWriter(args.out) as w:
        state, obs = envs.reset(jax.random.PRNGKey(0))
        for ep in range(args.episodes):
            for t in range(args.steps):
                acts = agent.eval_action(jnp.asarray(obs))
                state, out = envs.step(state, acts)
                w.write({
                    "obs": np.asarray(obs),
                    "action": np.asarray(acts),
                    "reward": np.asarray(out["reward"]),
                    "done": np.asarray(out["done"]),
                    "success": np.asarray(out["success"]),
                })
                obs = out["obs"]
        w.flush()
        stats = w.stats()
    dt = time.time() - t0
    steps = args.episodes * args.steps * envs.num_envs
    print(f"wrote {stats} to {args.out}; {steps} env-steps in {dt:.1f}s "
          f"({steps/dt:,.0f} steps/s incl. IO)")


if __name__ == "__main__":
    main()
