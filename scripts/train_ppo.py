"""End-to-end PPO training on the batched engine — the reference's user
story ("plug the envs into your RL loop") done TPU-natively: rollout AND
learner update live in one jitted program; nothing leaves the device
between env steps and gradient steps.

    # quick single-task demo (CPU ok):
    python scripts/train_ppo.py --env reach-v3 --updates 40 --cpu

    # multi-task with one-hot task IDs:
    python scripts/train_ppo.py --bench MT10 --envs-per-task 128

The rollout is a lax.scan over the fused engine step; GAE and the clipped
PPO objective run on the stacked on-device trajectory. On a multi-chip
mesh, shard the env axis with metaworld_tpu.parallel (see ShardedEnvs) and
let XLA psum the gradients — the loop body is unchanged.

Expectation-setting: model-free PPO on Meta-World needs millions of env
steps (published MT baselines train 10-20M+ steps per task); a few hundred
CPU updates here demonstrates the wiring, not a solved task. On a TPU chip
the same script sustains >10^6 env-steps/s, so the full budget is minutes.
For FAST convergence use the differentiable-physics path instead:
scripts/train_apg.py solves reach-v3 in ~30 s on a CPU by backpropagating
through the engine.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default=None, help="single env name (MT1)")
    ap.add_argument("--num-goals", type=int, default=50,
                    help="goals per task (MT1 path only)")
    ap.add_argument("--bench", default=None, help="MT10/MT25/MT50")
    ap.add_argument("--envs-per-task", type=int, default=64)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--updates", type=int, default=50)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--lam", type=float, default=0.95)
    ap.add_argument("--clip", type=float, default=0.2)
    ap.add_argument("--reward-norm", action="store_true",
                    help="normalize rewards with the gymnasium-style "
                         "discounted-return normalizer (EnvPipeline)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    import metaworld_tpu as mw

    if args.bench:
        bench = getattr(mw, args.bench)(seed=args.seed)
        one_hot = True
    else:
        bench = mw.MT1(args.env or "reach-v3", seed=args.seed,
                       num_goals=args.num_goals)
        one_hot = False
    envs = mw.vector.from_benchmark(
        bench, envs_per_task=args.envs_per_task, one_hot=one_hot)
    if args.reward_norm:
        from metaworld_tpu.wrappers import EnvPipeline

        envs = EnvPipeline(envs, reward_normalization_method="gymnasium",
                           reward_norm_gamma=args.gamma)
    obs_dim, n_envs = envs.obs_dim, envs.num_envs

    class ActorCritic(nn.Module):
        """Separate actor/critic trunks: the value regression target is
        O(100) (discounted returns of [0,10] rewards), and a shared trunk
        lets the value gradient wreck the policy features."""

        @nn.compact
        def __call__(self, x):
            ha = x
            for _ in range(2):
                ha = nn.tanh(nn.Dense(256)(ha))
            # bounded mean: an unbounded mean + action clip saturates the
            # policy (logp keeps moving while behavior doesn't)
            mean = nn.tanh(nn.Dense(4)(ha))
            log_std = jnp.clip(
                self.param("log_std", nn.initializers.constant(-0.5), (4,)),
                -3.0, 0.5)
            hv = x
            for _ in range(2):
                hv = nn.tanh(nn.Dense(256)(hv))
            value = nn.Dense(1)(hv)[..., 0]
            return mean, log_std, value

    model = ActorCritic()
    key = jax.random.PRNGKey(args.seed)
    key, sub = jax.random.split(key)
    params = model.init(sub, jnp.zeros((1, obs_dim)))
    sched = optax.cosine_decay_schedule(args.lr, args.updates * args.epochs
                                        * args.minibatches, alpha=0.1)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(sched))
    opt_state = tx.init(params)

    def policy_sample(params, obs, key):
        mean, log_std, value = model.apply(params, obs)
        std = jnp.exp(log_std)
        act = mean + std * jax.random.normal(key, mean.shape)
        logp = (-0.5 * (((act - mean) / std) ** 2 + 2 * log_std
                        + jnp.log(2 * jnp.pi))).sum(-1)
        return jnp.clip(act, -1, 1), logp, value

    def rollout(params, vstate, obs, key):
        def body(carry, _):
            vstate, obs, key = carry
            key, sub = jax.random.split(key)
            act, logp, value = policy_sample(params, obs, sub)
            vstate, out = envs.step(vstate, act)
            done = (out["terminated"] | out["truncated"]).astype(jnp.float32)
            trans = (obs, act, logp, value, out["reward"], done, out["success"])
            return (vstate, out["obs"], key), trans

        (vstate, obs, key), traj = jax.lax.scan(
            body, (vstate, obs, key), None, length=args.rollout)
        _, _, last_value = model.apply(params, obs)
        return vstate, obs, key, traj, last_value

    def gae(rewards, values, dones, last_value):
        def body(carry, t):
            adv = carry
            nv = jnp.where(t == args.rollout - 1, last_value, values_pad[t + 1])
            delta = rewards[t] + args.gamma * nv * (1 - dones[t]) - values[t]
            adv = delta + args.gamma * args.lam * (1 - dones[t]) * adv
            return adv, adv

        values_pad = jnp.concatenate([values, last_value[None]], axis=0)
        _, advs = jax.lax.scan(body, jnp.zeros_like(last_value),
                               jnp.arange(args.rollout)[::-1])
        advs = advs[::-1]
        return advs, advs + values

    def ppo_loss(params, batch):
        obs, act, old_logp, adv, ret = batch
        mean, log_std, value = model.apply(params, obs)
        std = jnp.exp(log_std)
        logp = (-0.5 * (((act - mean) / std) ** 2 + 2 * log_std
                        + jnp.log(2 * jnp.pi))).sum(-1)
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - args.clip, 1 + args.clip) * adv_n).mean()
        vloss = jnp.square(value - ret).mean()
        ent = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum()
        return pg + 0.5 * vloss - 5e-3 * ent

    @jax.jit
    def update(params, opt_state, vstate, obs, key):
        vstate, obs, key, traj, last_value = rollout(params, vstate, obs, key)
        t_obs, t_act, t_logp, t_val, t_rew, t_done, t_succ = traj
        adv, ret = gae(t_rew, t_val, t_done, last_value)
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]),
            (t_obs, t_act, t_logp, adv, ret))
        n = flat[0].shape[0]

        def epoch(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            perm = jax.random.permutation(sub, n)
            shuf = jax.tree.map(lambda x: x[perm], flat)
            mbs = jax.tree.map(
                lambda x: x.reshape((args.minibatches, -1) + x.shape[1:]), shuf)

            def mb(carry, batch):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(ppo_loss)(params, batch)
                upd, opt_state = tx.update(grads, opt_state)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb, (params, opt_state), mbs)
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch, (params, opt_state, key), None, length=args.epochs)
        stats = {
            "loss": losses.mean(),
            "mean_reward": t_rew.mean(),
            "success_rate": t_succ.max(0).mean(),
        }
        return params, opt_state, vstate, obs, key, stats

    key, sub = jax.random.split(key)
    vstate, obs = envs.reset(sub)
    t0 = time.time()
    for i in range(args.updates):
        params, opt_state, vstate, obs, key, stats = update(
            params, opt_state, vstate, obs, key)
        if i % 10 == 0 or i == args.updates - 1:
            stats = {k: round(float(v), 4) for k, v in stats.items()}
            sps = n_envs * args.rollout * (i + 1) / (time.time() - t0)
            print(json.dumps({"update": i, **stats,
                              "env_steps_per_s": round(sps)}), flush=True)


if __name__ == "__main__":
    main()
