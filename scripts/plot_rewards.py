"""Reward-shape plots along scripted-expert trajectories.

The reference ships notebooks (scripts/plot_rewards_returns*.ipynb) that
visualize each task's reward curve; this is the batch-engine equivalent:
jitted scripted rollouts, one subplot per task with the v2 (and optionally
v1) reward plus the success indicator.

    python scripts/plot_rewards.py --envs reach-v3 push-v3 pick-place-v3 \
        --out /tmp/rewards.png --v1 --cpu
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", nargs="+", default=["reach-v3", "push-v3",
                                                  "pick-place-v3",
                                                  "drawer-open-v3"])
    ap.add_argument("--out", default="rewards.png")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--v1", action="store_true",
                    help="overlay the legacy v1 reward (own scale, right axis)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    import metaworld_tpu as mw
    from metaworld_tpu.envs import registry
    from metaworld_tpu.envs.core import env_reset, env_step
    from metaworld_tpu.policies import get_policy
    from metaworld_tpu.types import MAX_RAND

    n = len(args.envs)
    cols = min(n, 3)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.2 * rows),
                             squeeze=False)

    for i, name in enumerate(args.envs):
        ax = axes[i // cols][i % cols]
        task = mw.MT1(name, seed=args.seed).train_tasks[0]
        rand = np.zeros(MAX_RAND)
        rand[: task.rand_vec.shape[0]] = task.rand_vec
        pol = get_policy(name)

        def trace(spec):
            @jax.jit
            def run(rand):
                state, obs = env_reset(spec, rand, jax.random.PRNGKey(0), 1.0)

                def body(carry, _):
                    state, obs = carry
                    state, out = env_step(spec, state, pol(obs))
                    return (state, out.obs), (out.reward, out.success)

                _, (r, s) = jax.lax.scan(body, (state, obs), None,
                                         length=args.steps)
                return r, s

            return map(np.asarray, run(jnp.asarray(rand)))

        r2, s2 = trace(registry.get_spec(name))
        ax.plot(r2, label="v2 reward", color="tab:blue")
        succ_at = np.argmax(s2) if s2.max() > 0 else None
        if succ_at is not None:
            ax.axvline(succ_at, color="tab:green", ls="--",
                       label=f"success @ {succ_at}")
        if args.v1:
            r1, _ = trace(registry.get_spec(name, "v1"))
            ax2 = ax.twinx()
            ax2.plot(r1, label="v1 reward", color="tab:orange", alpha=0.6)
            ax2.set_ylabel("v1")
        ax.set_title(name)
        ax.set_xlabel("step")
        ax.set_ylabel("v2")
        ax.legend(loc="lower right", fontsize=8)

    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
