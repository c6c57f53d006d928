"""Evaluation protocol + wrapper transform tests (mirrors
ref tests/metaworld/test_evaluation.py thresholds on a reduced config)."""

import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu import benchmarks, vector, wrappers
from metaworld_tpu.evaluation import ScriptedAgent, evaluation


def test_evaluation_mt10_scripted():
    """Scripted agents on MT10 must clear the reference's 0.80 bar
    (ref test_evaluation.py:103-105; reduced to 3 episodes for speed)."""
    bench = benchmarks.MT10(seed=42)
    envs = vector.from_benchmark(
        bench, envs_per_task=2, terminate_on_success=True
    )
    agent = ScriptedAgent(envs)
    mean_success, mean_returns, per_task, _ = evaluation(
        agent, envs, num_episodes=3, key=jax.random.PRNGKey(0)
    )
    assert mean_success >= 0.8, per_task
    assert mean_returns > 0


def test_reward_normalizers():
    norm = wrappers.DiscountedRewardNorm(num_envs=16)
    st = norm.init()
    key = jax.random.PRNGKey(0)
    for _ in range(50):
        key, sub = jax.random.split(key)
        r = jax.random.normal(sub, (16,)) * 5 + 2
        st, rn = norm(st, r, jnp.zeros(16))
    assert np.isfinite(np.asarray(rn)).all()
    assert np.abs(np.asarray(rn)).mean() < 5

    en = wrappers.ExponentialRewardNorm()
    est = en.init()
    for _ in range(10):
        est, rn2 = en(est, r)
    assert abs(float(np.asarray(rn2).mean())) < 1.5


def test_obs_norm_and_rnn_augment():
    on = wrappers.ObservationNorm(obs_dim=39)
    st = on.init()
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 39)) * 3 + 1
    for _ in range(20):
        st, o = on(st, obs)
    assert np.abs(np.asarray(o).mean()) < 0.5

    aug = wrappers.RNNMetaRLAugment(num_envs=8)
    ast = aug.init()
    out = aug.augment(ast, obs)
    assert out.shape == (8, 45)
    ast = aug.update(ast, jnp.ones((8, 4)), jnp.ones(8), jnp.ones(8, dtype=bool))
    out2 = aug.augment(ast, obs)
    np.testing.assert_array_equal(np.asarray(out2[:, 39:43]), 1.0)


def test_pseudo_random_goals_cycle():
    """Every goal visited once per epoch, reshuffled afterwards
    (ref PseudoRandomTaskSelectWrapper semantics)."""
    pr = wrappers.PseudoRandomGoals(num_envs=4, n_goals=5)
    st = pr.init(jax.random.PRNGKey(0))
    seen = [[] for _ in range(4)]
    for _ in range(10):
        st, idx = pr.next_goal(st, jnp.ones(4, dtype=bool))
        for i, v in enumerate(np.asarray(idx)):
            seen[i].append(int(v))
    for s in seen:
        assert sorted(s[:5]) == [0, 1, 2, 3, 4]
        assert sorted(s[5:]) == [0, 1, 2, 3, 4]


def test_checkpoint_roundtrip():
    """Checkpoint = serialize the pytree; restore resumes bit-exact
    (replaces ref CheckpointWrapper + RNG pickling, wrappers.py:275-322)."""
    bench = benchmarks.MT1("reach-v3", seed=0)
    envs = vector.from_benchmark(bench, envs_per_task=4)
    state, obs = envs.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((4, 4))
    for _ in range(5):
        state, out = envs.step(state, acts)
    blob = wrappers.checkpoint(state)

    state2 = wrappers.restore(state, blob)
    s_a, o_a = envs.step(state, acts)
    s_b, o_b = envs.step(state2, acts)
    np.testing.assert_array_equal(np.asarray(o_a["obs"]), np.asarray(o_b["obs"]))
