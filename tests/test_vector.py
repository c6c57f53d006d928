"""Vector engine + benchmark tests (mirrors ref tests/integration/test_new_api.py
and tests/metaworld/test_gym_make.py invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu import benchmarks, vector
from metaworld_tpu.policies import get_policy


def test_mt1_tasks_bit_exact_with_reference(golden):
    """Benchmark goal vectors replay the reference's numpy sampling exactly
    (ref tests/integration/test_new_api.py:278-323 determinism)."""
    for name in ("reach-v3", "pick-place-v3", "door-open-v3", "hammer-v3"):
        d = golden(name)
        mt1 = benchmarks.MT1(name, seed=42)
        np.testing.assert_allclose(
            mt1.train_tasks[0].rand_vec, d["attr_last_rand_vec"], atol=1e-12
        )


def test_tasks_unique_and_counted():
    """50 unique goals per env (ref __init__.py:156-159, test_new_api
    check_tasks_unique)."""
    mt1 = benchmarks.MT1("push-v3", seed=7)
    assert len(mt1.train_tasks) == 50
    vecs = {tuple(t.rand_vec) for t in mt1.train_tasks}
    assert len(vecs) == 50


def test_num_goals_plumbed_through_factories():
    """`num_goals` must reach the benchmark constructors (ref __init__.py:
    618-621 num_goals mutates _N_GOALS): asking for 4 goals yields 4-row
    goal tables at every level."""
    from metaworld_tpu.gym_adapter import make_ml_envs, make_mt_envs

    mt1 = benchmarks.MT1("reach-v3", seed=1, num_goals=4)
    assert len(mt1.train_tasks) == 4
    assert mt1.goal_table("reach-v3").shape[0] == 4
    mt10 = benchmarks.MT10(seed=1, num_goals=4)
    assert len(mt10.train_tasks) == 10 * 4
    ml1 = benchmarks.ML1("reach-v3", seed=1, num_goals=4)
    assert len(ml1.train_tasks) == 4 and len(ml1.test_tasks) == 4

    envs = make_mt_envs("reach-v3", seed=1, num_goals=4)
    assert envs.goal_tables[0].shape[0] == 4
    envs = make_ml_envs("reach-v3", seed=1, meta_batch_size=2, num_goals=4)
    assert envs.goal_tables[0].shape[0] == 4


def test_same_seed_same_tasks():
    a = benchmarks.MT10(seed=3)
    b = benchmarks.MT10(seed=3)
    for ta, tb in zip(a.train_tasks, b.train_tasks):
        assert ta.env_name == tb.env_name
        np.testing.assert_array_equal(ta.rand_vec, tb.rand_vec)


def test_ml_test_seed_differs():
    ml1 = benchmarks.ML1("reach-v3", seed=5)
    tr = {tuple(t.rand_vec) for t in ml1.train_tasks}
    te = {tuple(t.rand_vec) for t in ml1.test_tasks}
    assert not tr & te
    assert all(t.partially_observable for t in ml1.train_tasks)


def test_ml45_split_counts():
    assert len(benchmarks.ML45_TRAIN) == 45
    assert len(benchmarks.ML45_TEST) == 5
    assert not set(benchmarks.ML45_TRAIN) & set(benchmarks.ML45_TEST)


def test_mt10_vector_rollout():
    """MT10 batch: one-hot block valid, obs shape, rewards finite, autoreset
    resets at the horizon."""
    bench = benchmarks.MT10(seed=0)
    envs = vector.from_benchmark(
        bench, envs_per_task=4, one_hot=True, max_episode_steps=40
    )
    assert envs.num_envs == 40
    state, obs = envs.reset(jax.random.PRNGKey(0))
    assert obs.shape == (40, 49)
    oh = np.asarray(obs[:, 39:])
    assert (oh.sum(axis=1) == 1).all()
    # each block of 4 envs has the same one-hot index, all 10 present
    idx = oh.argmax(axis=1).reshape(10, 4)
    assert (idx == idx[:, :1]).all()
    assert sorted(set(idx[:, 0])) == list(range(10))

    acts = jnp.zeros((40, 4))
    returns = []
    for t in range(42):
        state, out = envs.step(state, acts)
        returns.append(np.asarray(out["reward"]))
        if t == 39:
            assert bool(np.asarray(out["truncated"]).all())
        if t == 40:
            # autoreset happened: path length back to 1
            assert bool(np.asarray(out["truncated"]).any()) is False
    r = np.stack(returns)
    assert np.isfinite(r).all()


def test_goal_hidden_vs_observable():
    """ML batches hide the goal in obs (ref test_new_api.py:146)."""
    bench = benchmarks.ML1("reach-v3", seed=1)
    envs = vector.from_benchmark(bench, split="train", envs_per_task=2)
    state, obs = envs.reset(jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(obs[:, 36:39]), 0.0)

    mt = benchmarks.MT1("reach-v3", seed=1)
    envs2 = vector.from_benchmark(mt, envs_per_task=2)
    state2, obs2 = envs2.reset(jax.random.PRNGKey(1))
    assert np.abs(np.asarray(obs2[:, 36:39])).sum() > 0


def test_scripted_policy_through_vector():
    """Closed-loop MT1 batch with the scripted expert: all slots succeed."""
    bench = benchmarks.MT1("reach-v3", seed=11)
    envs = vector.from_benchmark(bench, envs_per_task=8)
    policy = jax.vmap(get_policy("reach-v3"))
    state, obs = envs.reset(jax.random.PRNGKey(3))
    succ = np.zeros(8)
    for _ in range(150):
        state, out = envs.step(state, policy(obs))
        obs = out["obs"]
        succ = np.maximum(succ, np.asarray(out["success"]))
    assert succ.min() == 1.0


def test_fused_matches_grouped():
    """FusedBatchedEnvs (single-vmap physics + per-task tails) must produce
    IDENTICAL trajectories to the grouped BatchedEnvs for the same keys —
    the fusion is a pure performance transform."""
    bench = benchmarks.MT10(seed=0)
    names = list(bench.train_classes.keys())[:4]
    kwargs = dict(
        specs=[bench.train_classes[n] for n in names],
        counts=[3] * 4,
        goal_tables=[bench.goal_table(n) for n in names],
        goal_visible=True,
        max_episode_steps=30,
    )
    grouped = vector.BatchedEnvs(**kwargs)
    fused = vector.FusedBatchedEnvs(**kwargs)
    sg, og = grouped.reset(jax.random.PRNGKey(7))
    sf, of = fused.reset(jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(og), np.asarray(of), atol=1e-6)
    rng = np.random.default_rng(0)
    for t in range(35):   # crosses the autoreset boundary at t=30
        acts = jnp.asarray(rng.uniform(-1, 1, (12, 4)))
        sg, outg = grouped.step(sg, acts)
        sf, outf = fused.step(sf, acts)
        for k in ("obs", "reward", "terminated", "truncated", "success"):
            np.testing.assert_allclose(
                np.asarray(outg[k]), np.asarray(outf[k]), atol=1e-5,
                err_msg=f"key {k} diverged at t={t}")


def test_next_step_autoreset_semantics():
    """Gymnasium NEXT_STEP autoreset: at the horizon the env returns its
    FINAL observation with truncated=True; the following step ignores the
    action, returns the reset observation, reward 0, and no flags."""
    bench = benchmarks.MT1("reach-v3", seed=0, num_goals=3)
    envs = vector.from_benchmark(bench, envs_per_task=2, max_episode_steps=5)
    state, obs0 = envs.reset(jax.random.PRNGKey(1))
    acts = jnp.asarray(np.full((2, 4), 0.5))
    for t in range(5):
        state, out = envs.step(state, acts)
    assert bool(np.asarray(out["truncated"]).all())
    final_obs = np.asarray(out["obs"])
    # the post-horizon step: fresh episode
    state, out = envs.step(state, acts)
    assert not bool(np.asarray(out["truncated"]).any())
    assert not bool(np.asarray(out["terminated"]).any())
    assert np.asarray(out["reward"]).max() == 0.0
    reset_obs = np.asarray(out["obs"])
    # reset obs is a fresh hand-at-init observation, not the final one
    assert not np.allclose(reset_obs[:, :3], final_obs[:, :3], atol=1e-4)
    assert bool(np.asarray(out["episode_length"]).max() == 1)
