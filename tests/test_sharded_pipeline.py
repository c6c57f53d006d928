"""Multi-device engine (ShardedEnvs) + wrapper-stack assembly (EnvPipeline)
tests, plus the reference's hand-space clamp invariant
(ref tests/.../test_obs_space_hand.py:44-64)."""

import jax
import jax.numpy as jnp
import numpy as np

import metaworld_tpu as mw
from metaworld_tpu.parallel import mesh as pmesh
from metaworld_tpu.parallel.sharded import ShardedEnvs
from metaworld_tpu.types import HAND_SPACE_HIGH, HAND_SPACE_LOW


def test_sharded_envs_matches_local():
    """True equivalence: the 8-shard shard_map engine produces BIT-IDENTICAL
    trajectories to running each shard's local FusedBatchedEnvs program by
    hand with that shard's key (the sharded reset derives shard i's key as
    split(key)[i]; zero-communication stepping implies exact agreement)."""
    bench = mw.MT1("reach-v3", seed=0, num_goals=4)
    m = pmesh.make_env_mesh(8)
    envs = ShardedEnvs(bench, envs_per_task=16, mesh=m)
    assert envs.num_envs == 16
    key = jax.random.PRNGKey(0)
    state, obs = envs.reset(key)
    assert obs.shape == (16, 39)
    rng = np.random.default_rng(7)
    acts = rng.uniform(-1, 1, size=(5, 16, 4))
    sharded_obs, sharded_rew = [], []
    for t in range(5):
        state, out = envs.step(state, jnp.asarray(acts[t]))
        sharded_obs.append(np.asarray(out["obs"]))
        sharded_rew.append(np.asarray(out["reward"]))

    # replay per shard on the LOCAL (unsharded) engine with the same keys
    keys = jax.random.split(key, 8)
    per_shard = envs.local.num_envs  # 2 slots per shard
    local_obs = [[] for _ in range(5)]
    local_rew = [[] for _ in range(5)]
    for i in range(8):
        st, ob = envs.local.reset(keys[i])
        for t in range(5):
            a = acts[t][i * per_shard:(i + 1) * per_shard]
            st, out = envs.local.step(st, jnp.asarray(a))
            local_obs[t].append(np.asarray(out["obs"]))
            local_rew[t].append(np.asarray(out["reward"]))
    for t in range(5):
        np.testing.assert_array_equal(
            sharded_obs[t], np.concatenate(local_obs[t], axis=0))
        np.testing.assert_array_equal(
            sharded_rew[t], np.concatenate(local_rew[t], axis=0))


def test_sharded_envs_divisibility_guard():
    m = pmesh.make_env_mesh(8)
    try:
        ShardedEnvs(mw.MT1("reach-v3", seed=0, num_goals=2),
                    envs_per_task=12, mesh=m)
        raise RuntimeError("expected AssertionError")
    except AssertionError:
        pass


def test_pipeline_assembly_via_factory():
    envs = mw.make_mt_envs(
        "reach-v3", seed=1, envs_per_task=3, num_goals=4,
        reward_normalization_method="gymnasium",
        normalize_observations=True,
        recurrent_info_in_obs=True,
    )
    state, obs = envs.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 39 + 6)  # RNN augment appends 6 dims
    prev_r = None
    for _ in range(4):
        state, out = envs.step(state, np.zeros((3, 4)))
    # normalized rewards are finite and not the raw v2 magnitudes forever
    assert np.isfinite(np.asarray(out["reward"])).all()
    # the augmented slots carry prev action (zeros) + prev reward + done
    assert out["obs"].shape == (3, 45)


def test_pipeline_checkpoint_roundtrip():
    from metaworld_tpu import wrappers as W

    envs = mw.make_mt_envs("push-v3", seed=2, envs_per_task=2, num_goals=3,
                           reward_normalization_method="exponential")
    state, obs = envs.reset(jax.random.PRNGKey(3))
    state, out = envs.step(state, np.zeros((2, 4)))
    blob = W.checkpoint(state[0], wrapper_states=state[1:])
    v, w = W.restore(state[0], blob, wrapper_templates=state[1:])
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state[0], v)
    del chex_equal
    state2 = (v, *w)
    _, out2 = envs.step(state2, np.zeros((2, 4)))
    np.testing.assert_allclose(np.asarray(out2["reward"]),
                               np.asarray(envs.step(state, np.zeros((2, 4)))[1]["reward"]))


def test_hand_space_clamp():
    """Driving hard toward far-away corners for 100 steps must keep the tcp
    inside HAND_SPACE (ref test_obs_space_hand.py:44-64)."""
    from metaworld_tpu.envs.core import env_reset, env_step
    from metaworld_tpu.envs import registry

    spec = registry.get_spec("reach-v3")
    rng = np.random.default_rng(0)
    lo, hi = np.asarray(HAND_SPACE_LOW), np.asarray(HAND_SPACE_HIGH)

    @jax.jit
    def drive(rand, key, acts):
        state, obs = env_reset(spec, rand, key, 1.0)

        def body(carry, a):
            st, _ = carry
            st, out = env_step(spec, st, a)
            return (st, out.obs), out.obs[:3]

        (_, _), hands = jax.lax.scan(body, (state, obs), acts)
        return hands

    for trial in range(5):
        acts = np.sign(rng.standard_normal((100, 4))).astype(np.float64)
        acts[:, :3] = rng.choice([-1.0, 1.0], size=(1, 3))  # slam a corner
        rand = np.zeros(12)
        rand[:6] = [0.0, 0.65, 0.02, 0.0, 0.8, 0.2]
        hands = np.asarray(drive(jnp.asarray(rand), jax.random.PRNGKey(trial),
                                 jnp.asarray(acts)))
        assert (hands >= lo - 1e-6).all() and (hands <= hi + 1e-6).all(), (
            f"trial {trial}: tcp escaped HAND_SPACE: "
            f"{hands.min(0)} .. {hands.max(0)}")


def test_sim_instability_guard():
    """A non-finite physics update must keep the last stable state and
    report reward 0, then recover (ref _did_see_sim_exception,
    sawyer_xyz_env.py:235,603-619)."""
    from metaworld_tpu.envs import registry
    from metaworld_tpu.envs.core import env_reset, env_step

    spec = registry.get_spec("reach-v3")
    rand = np.zeros(12)
    rand[:6] = [0.0, 0.65, 0.02, 0.0, 0.8, 0.2]
    st, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    step = jax.jit(lambda s, a: env_step(spec, s, a))
    st, out = step(st, jnp.array([jnp.nan, 0.0, 0.0, 1.0]))
    assert float(out.reward) == 0.0
    assert bool(jnp.isfinite(out.obs).all())
    assert bool(jnp.isfinite(st.sim.hand).all())
    st, out = step(st, jnp.zeros(4))
    assert bool(jnp.isfinite(out.obs).all()) and float(out.reward) > 0.0


def test_sim_instability_guard_fused():
    """Same guard on the fused batch: one poisoned slot reports reward 0 and
    stays finite; the rest of the batch is unaffected."""
    bench = mw.MT1("push-v3", seed=0, num_goals=4)
    envs = mw.vector.from_benchmark(bench, envs_per_task=4, fused=True)
    state, obs = envs.reset(jax.random.PRNGKey(0))
    acts = np.zeros((4, 4))
    acts[1, 0] = np.nan
    state, out = envs.step(state, jnp.asarray(acts))
    r = np.asarray(out["reward"])
    assert r[1] == 0.0
    assert np.isfinite(np.asarray(out["obs"])).all()
    state, out = envs.step(state, jnp.zeros((4, 4)))
    assert np.isfinite(np.asarray(out["reward"])).all()
    assert np.asarray(out["reward"])[1] != 0.0
