"""Evaluation protocols (ref metaworld/evaluation.py).

`evaluation` runs agents on a batch until every task has `num_episodes`
episodic returns (ref :48-103); `metalearning_evaluation` cycles through
goal sets, collects adaptation episodes, calls agent.adapt, then evaluates
(ref :106-169). Agents follow the same protocols as the reference (:12-35),
with batched jnp observations/actions.
"""

from __future__ import annotations

from typing import NamedTuple, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu.vector import BatchedEnvs


class Agent(Protocol):
    """(ref evaluation.py:12-19)"""

    def eval_action(self, observations): ...

    def reset(self, env_mask): ...


class MetaLearningAgent(Agent, Protocol):
    """(ref evaluation.py:22-35)"""

    def init(self): ...

    def adapt_action(self, observations): ...

    def adapt(self, timesteps): ...


class Timestep(NamedTuple):
    """(ref evaluation.py:172-179)"""

    observation: np.ndarray
    action: np.ndarray
    reward: np.ndarray
    terminated: np.ndarray
    truncated: np.ndarray
    next_observation: np.ndarray


class ScriptedAgent:
    """Batched scripted-expert agent: one policy per env slot (the
    evaluation oracle, ref tests/metaworld/test_evaluation.py)."""

    def __init__(self, envs: BatchedEnvs):
        from metaworld_tpu.policies import get_policy

        fns = []
        for spec, count in zip(envs.specs, envs.counts):
            pol = get_policy(spec.name)
            fns.append((pol, count))
        obs_dim = envs.obs_dim

        def act(obs):
            outs = []
            start = 0
            for pol, count in fns:
                outs.append(jax.vmap(pol)(
                    jax.lax.dynamic_slice_in_dim(obs[:, :39], start, count, 0)
                ))
                start += count
            return jnp.concatenate(outs, axis=0)

        self._act = jax.jit(act)

    def eval_action(self, observations):
        return self._act(observations)

    def reset(self, env_mask):
        pass


def evaluation(agent: Agent, eval_envs: BatchedEnvs, num_episodes: int = 50,
               key=None, max_steps: int | None = None, vstate=None):
    """MT success-rate protocol (ref evaluation.py:48-103): terminate on
    success, count an episode successful if any step succeeded, run until
    every env slot has `num_episodes` episodes.

    Pass `vstate` to evaluate on that state's pinned goals (pseudorandom
    mode) — the meta protocol's "same tasks as adaptation" requirement.

    Returns (mean_success_rate, mean_returns, success_per_task,
    returns_per_task) with per-task dicts keyed by env name."""
    key = key if key is not None else jax.random.PRNGKey(0)
    assert eval_envs.terminate_on_success, (
        "evaluation expects terminate_on_success=True envs (the reference "
        "toggles it, ref evaluation.py:54)"
    )
    state, obs = eval_envs.reset(key, vstate=vstate)
    n = eval_envs.num_envs
    episodes = np.zeros(n, dtype=int)
    successes = np.zeros(n)
    returns_sum = np.zeros(n)
    cur_success = np.zeros(n)

    max_steps = max_steps or (num_episodes + 1) * eval_envs.max_episode_steps
    agent.reset(np.ones(n, dtype=bool))
    for _ in range(max_steps):
        actions = agent.eval_action(obs)
        state, out = eval_envs.step(state, actions)
        obs = out["obs"]
        cur_success = np.maximum(cur_success, np.asarray(out["success"]))
        done = np.asarray(out["done"])
        if done.any():
            agent.reset(done)
            live = (episodes < num_episodes) & done
            successes += np.where(live, cur_success, 0.0)
            returns_sum += np.where(live, np.asarray(out["episode_return"]), 0.0)
            episodes += live.astype(int)
            cur_success = np.where(done, 0.0, cur_success)
        if (episodes >= num_episodes).all():
            break

    names = eval_envs.env_task_names()
    per_task_success: dict[str, float] = {}
    per_task_returns: dict[str, float] = {}
    eps = np.maximum(episodes, 1)
    for t in sorted(set(names)):
        m = np.array([nm == t for nm in names])
        per_task_success[t] = float((successes[m] / eps[m]).mean())
        per_task_returns[t] = float((returns_sum[m] / eps[m]).mean())
    mean_success = float(np.mean(list(per_task_success.values())))
    mean_returns = float(np.mean(list(per_task_returns.values())))
    return mean_success, mean_returns, per_task_success, per_task_returns


def metalearning_evaluation(
    agent: MetaLearningAgent,
    eval_envs: BatchedEnvs,
    num_evals: int = 10,
    adaptation_steps: int = 1,
    adaptation_episodes: int = 10,
    num_episodes: int = 3,
    key=None,
):
    """Meta-RL adapt->eval protocol (ref evaluation.py:106-169): one
    pseudo-random task draw per eval round (`sample_tasks`), held FIXED
    through the adaptation episodes and the evaluation pass — the agent is
    evaluated on the tasks it adapted to (ref evaluation.py:114-125:
    toggle_sample_tasks_on_reset(False) + sample_tasks() per round)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    assert eval_envs.task_select == "pseudorandom", (
        "metalearning_evaluation needs task_select='pseudorandom' envs "
        "(the reference's PseudoRandomTaskSelectWrapper path)"
    )
    n = eval_envs.num_envs
    total_success, total_returns = 0.0, 0.0
    task_results: dict[str, list] = {}
    state, _ = eval_envs.reset(key)

    for ev in range(num_evals):
        key, k_reset, k_eval = jax.random.split(key, 3)
        state = eval_envs.sample_tasks(state)
        agent.init()
        for _ in range(adaptation_steps):
            state, obs = eval_envs.reset(k_reset, vstate=state)
            buf = []
            for _ in range(adaptation_episodes * eval_envs.max_episode_steps):
                actions = agent.adapt_action(obs)
                state, out = eval_envs.step(state, actions)
                buf.append(Timestep(
                    observation=np.asarray(obs),
                    action=np.asarray(actions),
                    reward=np.asarray(out["reward"]),
                    terminated=np.asarray(out["terminated"]),
                    truncated=np.asarray(out["truncated"]),
                    next_observation=np.asarray(out["obs"]),
                ))
                obs = out["obs"]
                if np.asarray(out["done"]).any():
                    break
            agent.adapt(buf)
        succ, rets, per_s, per_r = evaluation(
            agent, eval_envs, num_episodes=num_episodes, key=k_eval,
            vstate=state,
        )
        total_success += succ
        total_returns += rets
        for t, v in per_s.items():
            task_results.setdefault(t, []).append(v)

    per_task = {t: float(np.mean(v)) for t, v in task_results.items()}
    return (total_success / num_evals, total_returns / num_evals, per_task)
