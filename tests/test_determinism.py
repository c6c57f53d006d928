"""Determinism, reset idempotence, per-goal target uniqueness, and the
full Gymnasium ID registry (ref tests: test_identical_environments
test_new_api.py:278-323, test_seeded_rand_vec.py, check_target_poss_unique
test_new_api.py:250-275, test_gym_make.py)."""

import gymnasium as gym
import jax
import numpy as np
import pytest

import metaworld_tpu as mw
from metaworld_tpu.policies import get_policy


def test_identical_environments():
    """Two envs with the same seed/task produce bit-equal obs and rewards
    over a scripted rollout (ref test_new_api.py:278-323)."""
    pol = get_policy("push-v3")

    def rollout():
        env = mw.SawyerEnv("push-v3", seed=7)
        env.set_task(mw.MT1("push-v3", seed=7).train_tasks[0])
        obs, _ = env.reset()
        traj = [obs]
        rews = []
        for _ in range(80):
            obs, r, *_ = env.step(np.asarray(pol(obs)))
            traj.append(obs)
            rews.append(r)
        return np.asarray(traj), np.asarray(rews)

    t1, r1 = rollout()
    t2, r2 = rollout()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(r1, r2)


def test_reset_idempotent():
    """Same task => same object and goal positions across resets
    (ref test_sawyer_xyz_env.py:8-45)."""
    env = mw.SawyerEnv("pick-place-v3", seed=3)
    env.set_task(mw.MT1("pick-place-v3", seed=3).train_tasks[4])
    a, _ = env.reset()
    env.step(np.array([0.3, 0.2, -0.4, 1.0]))
    b, _ = env.reset()
    np.testing.assert_allclose(a[4:7], b[4:7], atol=1e-6)
    np.testing.assert_allclose(a[36:39], b[36:39], atol=1e-6)


def test_unique_targets_except_fixed_goal_envs():
    """Each env's 50 tasks have 50 distinct targets, except the four
    fixed-goal envs (ref check_target_poss_unique, test_new_api.py:250-275:
    {hammer, sweep-into, bin-picking, basketball})."""
    bench = mw.MT1("reach-v3", seed=0)
    fixed = mw.MT1("hammer-v3", seed=0)

    def targets(b, name):
        env = mw.SawyerEnv(name, seed=0)
        out = []
        for t in b.train_tasks[:10]:
            env.set_task(t)
            obs, _ = env.reset()
            out.append(tuple(np.round(obs[36:39], 6)))
        return out

    assert len(set(targets(bench, "reach-v3"))) == 10
    assert len(set(targets(fixed, "hammer-v3"))) == 1


def test_gym_make_vec_registry():
    """The reference's MT/ML vector IDs resolve through gym.make_vec
    (ref register_mw_envs __init__.py:630-823)."""
    mw.register_mw_envs()
    e = gym.make_vec("Meta-World/MT10", seed=0, envs_per_task=1)
    obs, _ = e.reset()
    assert obs.shape == (10, 39)
    obs, r, term, trunc, infos = e.step(np.zeros((10, 4)))
    assert r.shape == (10,) and "success" in infos
    e2 = gym.make_vec("Meta-World/ML1-test", env_name="pick-place-v3",
                      seed=1, meta_batch_size=2)
    o, _ = e2.reset()
    assert o.shape == (2, 39)
    # ML test goals are hidden
    assert np.allclose(o[:, 36:39], 0.0)
    e3 = gym.make_vec("Meta-World/custom-ml-envs",
                      train_envs=["reach-v3"], test_envs=["push-v3"],
                      seed=2, split="test", envs_per_task=2)
    o, _ = e3.reset()
    assert o.shape == (2, 39)


def test_reference_eval_loop_pattern_on_facade():
    """The reference's evaluation() consumption pattern — get_attr
    ('task_name'), call('toggle_terminate_on_success'), final_info episode
    returns + success at done steps (ref metaworld/evaluation.py:48-103) —
    must run unmodified against the gym.make_vec facade."""
    import jax.numpy as jnp

    from metaworld_tpu.evaluation import ScriptedAgent

    mw.register_mw_envs()
    env = gym.make_vec("Meta-World/MT10", seed=0, envs_per_task=1).unwrapped
    task_names = env.get_attr("task_name")
    assert len(task_names) == env.num_envs
    env.call("toggle_terminate_on_success", True)
    obs, _ = env.reset()
    agent = ScriptedAgent(env.envs)
    returns = {t: [] for t in set(task_names)}
    succ = {t: 0 for t in set(task_names)}
    for _ in range(1200):
        acts = agent.eval_action(jnp.asarray(obs))
        obs, _, term, trunc, infos = env.step(np.asarray(acts))
        for i, d in enumerate(np.asarray(term | trunc)):
            if d:
                returns[task_names[i]].append(
                    float(infos["final_info"]["episode"]["r"][i]))
                succ[task_names[i]] += int(infos["final_info"]["success"][i])
        if all(len(r) >= 1 for r in returns.values()):
            break
    assert all(len(r) >= 1 for r in returns.values())
    rate = np.mean([s / max(len(returns[t]), 1) for t, s in succ.items()])
    assert rate >= 0.8
