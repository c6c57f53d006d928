"""Gym adapter + public API tests (mirrors ref tests/metaworld/test_gym_make.py)."""

import numpy as np
import pytest

import metaworld_tpu as mw


def test_single_env_api():
    env = mw.SawyerEnv("reach-v3", seed=42)
    mt1 = mw.MT1("reach-v3", seed=42)
    env.set_task(mt1.train_tasks[0])
    obs, info = env.reset()
    assert obs.shape == (39,)
    from metaworld_tpu.policies import get_policy

    pol = get_policy("reach-v3")
    success = 0.0
    for _ in range(120):
        obs, r, term, trunc, info = env.step(np.asarray(pol(obs)))
        success = max(success, info["success"])
        if success:
            break
    assert success == 1.0


def test_step_before_task_raises():
    env = mw.SawyerEnv("push-v3")
    with pytest.raises(RuntimeError):
        env.step(np.zeros(4))


def test_truncation_enforced():
    env = mw.SawyerEnv("reach-v3", seed=0)
    env.reset()
    env.max_path_length = 3
    for _ in range(3):
        obs, r, te, tr, info = env.step(np.zeros(4))
    assert tr is True or env.curr_path_length == 3
    with pytest.raises(ValueError):
        env.step(np.zeros(4))


def test_make_mt_envs_and_registration():
    envs = mw.make_mt_envs("MT10", seed=1, use_one_hot=True)
    assert envs.num_envs == 10
    import gymnasium as gym

    mw.register_mw_envs()
    env = gym.make("Meta-World/MT1", env_name="reach-v3", seed=3).unwrapped
    obs, _ = env.reset()
    assert obs.shape == (39,)


def test_make_ml_envs_striping():
    envs = mw.make_ml_envs("ML10", seed=2, meta_batch_size=20)
    assert envs.num_envs == 20
    assert len(set(envs.task_names)) == 10
    with pytest.raises(AssertionError):
        mw.make_ml_envs("ML10", seed=2, meta_batch_size=7)


def test_goal_hidden_observable():
    h = mw.make_goal_hidden("pick-place-v3", seed=5)
    obs, _ = h.reset()
    np.testing.assert_array_equal(obs[36:39], 0.0)
    o = mw.make_goal_observable("pick-place-v3", seed=5)
    obs2, _ = o.reset()
    assert np.abs(obs2[36:39]).sum() > 0


def test_render_rgb():
    env = mw.SawyerEnv("pick-place-v3", seed=7, render_mode="rgb_array")
    env.reset()
    img = env.render()
    assert img.shape == (480, 480, 3) and img.dtype == np.uint8
    assert img.std() > 1  # actually drew something


def test_render_cameras_and_depth():
    """All reference cameras (xyz_base.xml:16-20,152-153) x rgb+depth at a
    custom resolution (width/height kwargs, ref __init__.py:407-410)."""
    import metaworld_tpu as mw

    task = mw.MT1("push-v3", seed=0, num_goals=1).train_tasks[0]
    for cam in ("corner", "corner2", "corner3", "corner4",
                "behindGripper", "gripperPOV"):
        env = mw.SawyerEnv("push-v3", seed=0, render_mode="rgb_array",
                           camera_name=cam, width=160, height=120)
        env.set_task(task)
        env.reset()
        img = env.render()
        assert img.shape == (120, 160, 3) and img.dtype == np.uint8, cam
        assert img.std() > 1, f"{cam}: blank render"
        denv = mw.SawyerEnv("push-v3", seed=0, render_mode="depth_array",
                            camera_name=cam, width=160, height=120)
        denv.set_task(task)
        denv.reset()
        d = denv.render()
        assert d.shape == (120, 160) and d.dtype == np.float32, cam
        assert float(d.max()) > 0.1, cam


def test_render_all_scenes_all_cameras():
    """Render smoke: every scene x every camera x rgb+depth (VERDICT r1
    renderer bar) at a small resolution."""
    import metaworld_tpu as mw
    from metaworld_tpu.envs import registry
    from metaworld_tpu.render import render_camera

    cams = ("topview", "corner", "corner2", "corner3", "corner4",
            "behindGripper", "gripperPOV")
    for name in registry.ALL_V3_ENVIRONMENTS:
        env = mw.SawyerEnv(name, seed=0)
        env.set_task(mw.MT1(name, seed=0, num_goals=1).train_tasks[0])
        env.reset()
        for cam in cams:
            img = render_camera(env.spec_, env._state, cam,
                                width=64, height=48)
            assert img.shape == (48, 64, 3), (name, cam)
            if cam != "topview":
                d = render_camera(env.spec_, env._state, cam,
                                  width=64, height=48, depth=True)
                assert d.shape == (48, 64), (name, cam)


def test_seeded_env_replays_reference_rng_stream():
    """A seeded env WITHOUT set_task draws goal vectors from gymnasium's
    np_random(seed) stream with the reference's double-reset_model +
    rejection draw structure (ref sawyer_xyz_env.py:664-682,697-710)."""
    from gymnasium.utils import seeding

    import metaworld_tpu as mw
    from metaworld_tpu.benchmarks import _rejects
    from metaworld_tpu.envs import registry

    for name in ("reach-v3", "pick-place-v3", "assembly-v3"):
        env = mw.SawyerEnv(name, seed=123)
        spec = registry.get_spec(name)
        rng, _ = seeding.np_random(123)

        def ref_draw():
            v = rng.uniform(spec.rand_low, spec.rand_high,
                            size=spec.rand_low.size)
            while _rejects(name, v):
                v = rng.uniform(spec.rand_low, spec.rand_high,
                                size=spec.rand_low.size)
            return v

        for _ in range(3):
            ref_draw()
            expect = ref_draw()          # second reset_model call wins
            obs, _ = env.reset()
            got = np.asarray(env._state.rand_vec)[: expect.shape[0]]
            np.testing.assert_allclose(got, expect, atol=1e-12)


def test_env_state_snapshot_and_pickle():
    """get_env_state/set_env_state restore an exact mid-episode state, and
    the whole env pickles (ref SawyerMocapBase :87-131)."""
    import pickle

    import metaworld_tpu as mw

    env = mw.SawyerEnv("push-v3", seed=9)
    env.set_task(mw.MT1("push-v3", seed=9).train_tasks[0])
    env.reset()
    for _ in range(20):
        obs, *_ = env.step(np.array([0.4, 0.2, -0.3, 1.0]))
    snap = env.get_env_state()
    obs_a, r_a, *_ = env.step(np.array([0.1, 0.1, 0.0, 1.0]))
    env.set_env_state(snap)
    obs_b, r_b, *_ = env.step(np.array([0.1, 0.1, 0.0, 1.0]))
    np.testing.assert_array_equal(obs_a, obs_b)
    assert r_a == r_b

    env.set_env_state(snap)
    clone = pickle.loads(pickle.dumps(env))
    obs_c, r_c, *_ = clone.step(np.array([0.1, 0.1, 0.0, 1.0]))
    np.testing.assert_array_equal(obs_a, obs_c)
    assert r_a == r_c


def test_render_all_tasks_topview():
    """The rasterizer must handle every scene (fixtures, multi-object,
    holes) without crashing and produce non-blank frames."""
    import metaworld_tpu as mw
    from metaworld_tpu.envs import registry
    from metaworld_tpu.render import render_state

    for name in registry.ALL_V3_ENVIRONMENTS:
        env = mw.SawyerEnv(name, seed=0)
        env.set_task(mw.MT1(name, seed=0, num_goals=1).train_tasks[0])
        env.reset()
        img = render_state(env.spec_, env._state)
        assert img.shape == (480, 480, 3), name
        assert (img != 235).any(), f"{name}: blank render"


def test_facade_sample_tasks_protocol():
    """GymVectorBatch speaks the reference meta-eval call surface:
    toggle_sample_tasks_on_reset(False) + sample_tasks() pins goals per
    round, resets (incl. autoreset) keep them (ref evaluation.py:114-125)."""
    import metaworld_tpu as mw
    import metaworld_tpu.gym_adapter as ga

    envs = mw.make_ml_envs_test("reach-v3", seed=0, meta_batch_size=2,
                                max_episode_steps=30)
    batch = ga.GymVectorBatch(envs, seed=0)
    batch.reset()
    batch.call("toggle_sample_tasks_on_reset", False)
    batch.call("sample_tasks")
    batch.reset()
    g1 = np.asarray(batch._state.env.rand_vec).copy()
    for _ in range(35):
        batch.step(np.zeros((batch.num_envs, 4)))
    np.testing.assert_array_equal(
        g1, np.asarray(batch._state.env.rand_vec))
    batch.call("sample_tasks")
    batch.reset()
    assert not np.array_equal(g1, np.asarray(batch._state.env.rand_vec))
