"""Behavior cloning from a recorded dataset — the offline-RL loop closed:
scripted experts -> native async trajectory store -> supervised policy ->
closed-loop evaluation on the batched engine.

    python scripts/train_bc.py --env drawer-open-v3 --cpu

Records expert rollouts through metaworld_tpu.native's C++ ring-buffer
writer (unless --data points at an existing file), fits an MLP policy by
MSE, and reports closed-loop success on fresh goals.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="drawer-open-v3")
    ap.add_argument("--data", default=None,
                    help="existing dataset; default records a fresh one")
    ap.add_argument("--record-episodes", type=int, default=1)
    ap.add_argument("--envs-per-task", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-episodes", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn

    import metaworld_tpu as mw
    from metaworld_tpu.native import TrajectoryReader, TrajectoryWriter
    from metaworld_tpu.policies import get_policy

    envs = mw.vector.from_benchmark(mw.MT1(args.env, seed=args.seed),
                                    envs_per_task=args.envs_per_task)
    pol = jax.jit(jax.vmap(get_policy(args.env)))

    # ---- record -----------------------------------------------------------
    data_path = args.data
    if data_path is None:
        data_path = f"/tmp/bc_{args.env}.ts"
        t0 = time.time()
        with TrajectoryWriter(data_path) as w:
            state, obs = envs.reset(jax.random.PRNGKey(args.seed))
            for _ in range(args.record_episodes * 500):
                acts = pol(jnp.asarray(obs))
                state, out = envs.step(state, acts)
                # record the EFFECTIVE xyz action: the engine clips the
                # mocap delta to [-1,1] (engine.control_step), and some
                # experts emit heavy-tailed raw magnitudes (drawer-open
                # peaks |a|>5) that are unlearnable noise for the clone
                # while being behaviorally identical to their clip
                a_rec = np.asarray(acts).copy()
                a_rec[:, :3] = np.clip(a_rec[:, :3], -1.0, 1.0)
                w.write({"obs": np.asarray(obs), "action": a_rec})
                obs = out["obs"]
            w.flush()
        print(f"recorded {data_path} in {time.time()-t0:.1f}s")

    obs_l, act_l = [], []
    for rec in TrajectoryReader(data_path):
        obs_l.append(rec["obs"])
        act_l.append(rec["action"])
    X = jnp.asarray(np.concatenate(obs_l)).astype(jnp.float32)
    Y = jnp.asarray(np.concatenate(act_l)).astype(jnp.float32)
    print(f"dataset: {X.shape[0]} transitions")

    # ---- fit --------------------------------------------------------------
    class Pi(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.tanh(nn.Dense(256)(nn.tanh(nn.Dense(256)(x))))
            return nn.tanh(nn.Dense(4)(h))

    model = Pi()
    params = model.init(jax.random.PRNGKey(args.seed), X[:1])
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def epoch(params, opt_state, key):
        perm = jax.random.permutation(key, X.shape[0])

        def mb(carry, idx):
            params, opt_state = carry

            def loss_fn(p):
                return jnp.mean(jnp.square(model.apply(p, X[idx]) - Y[idx]))

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(g, opt_state)
            return (optax.apply_updates(params, upd), opt_state), loss

        nb = X.shape[0] // 512
        idxs = perm[: nb * 512].reshape(nb, 512)
        (params, opt_state), losses = jax.lax.scan(mb, (params, opt_state), idxs)
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(args.seed + 1)
    for e in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = epoch(params, opt_state, sub)
    print(f"final BC loss: {float(loss):.5f}")

    # ---- closed-loop eval on fresh goals ---------------------------------
    state, obs = envs.reset(jax.random.PRNGKey(args.seed + 100))

    @jax.jit
    def eval_rollout(state, obs):
        def body(carry, _):
            state, obs = carry
            acts = model.apply(params, obs.astype(jnp.float32))
            state, out = envs.step(state, acts)
            return (state, out["obs"]), out["success"]

        (_, _), succ = jax.lax.scan(body, (state, obs), None, length=500)
        return succ.max(0)

    succ = np.asarray(eval_rollout(state, obs))
    print(json.dumps({"env": args.env, "bc_success_rate": float(succ.mean())}))


if __name__ == "__main__":
    main()
