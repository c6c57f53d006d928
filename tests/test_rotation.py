"""Rotational-dynamics unit tests: the engine's three rotation regimes
(sphere rolling, support righting, in-grip droop) and the live-quat
observation emission (ref _get_quat_objects per env; sawyer_xyz_env.py:
475-511 obs layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset, env_step
from metaworld_tpu.physics import maths


def _rollout(name, steps, policy=None, rand=None):
    spec = registry.get_spec(name)
    if rand is None:
        rand = np.zeros(12)
        rv = np.random.default_rng(0).uniform(spec.rand_low, spec.rand_high)
        rand[: rv.shape[0]] = rv
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    step = jax.jit(lambda s, a: env_step(spec, s, a))
    if policy is None:
        from metaworld_tpu.policies import get_policy

        pol = jax.jit(get_policy(name))
        policy = lambda o: pol(o)
    traj = []
    for _ in range(steps):
        state, out = step(state, policy(obs))
        obs = out.obs
        traj.append(np.asarray(obs))
    return spec, state, np.asarray(traj)


def test_sphere_rolls_on_ground():
    """A kicked soccer ball accumulates rotation (omega = (z x v)/r)."""
    spec, state, traj = _rollout("soccer-v3", 120)
    dq = np.abs(traj[:, 7:11] - traj[0, 7:11]).max()
    assert dq > 0.2, f"ball quat barely moved: {dq}"


def test_flat_object_stays_flat_under_drag():
    """A dragged puck stays essentially flat (righting kills tilt)."""
    spec, state, traj = _rollout("push-v3", 150)
    # xyzw emission: tilt lives in x/y components
    tilt = np.abs(traj[:, 7:9]).max()
    assert tilt < 0.12, f"puck tilted {tilt}"


def test_droop_engages_while_gripped_and_releases():
    """The carried hammer pitches toward the calibrated droop; after the
    episode the righting regime brings a grounded hammer back flat."""
    spec, state, traj = _rollout("hammer-v3", 200)
    # wxyz emission: pitch lives in the y component; q0 has -0.03
    pitch = traj[:, 9] - traj[0, 9]
    assert pitch.max() > 0.02, f"no droop while carried: {pitch.max()}"


def test_live_quat_gate_moves():
    """The assembly quat gate (1 - |obs[7:11] - ideal|/0.4, ref
    sawyer_assembly_peg_v3.py:146-152) must not be frozen at its reset
    value over a carry."""
    spec, state, traj = _rollout("assembly-v3", 200)
    ideal = np.array([0.707, 0.0, 0.0, 0.707])
    gate = np.maximum(1.0 - np.linalg.norm(traj[:, 7:11] - ideal, axis=1) / 0.4, 0.0)
    assert gate.min() < 0.995, "quat gate frozen at 1.0"
    assert gate.min() > 0.5, f"quat gate collapsed: {gate.min()}"


def test_fixture_quat_composes_with_joint():
    """door-open's reported quat rotates with the hinge: at reset it
    matches the closed-door orientation, after opening it differs by
    R(z, joint_q) exactly."""
    d = np.load("tests/golden/door-open-v3.npz")
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    spec, state, traj = _rollout("door-open-v3", 160, rand=rand)
    q_final = traj[-1, 7:11]
    assert not np.allclose(q_final, traj[0, 7:11], atol=0.05)
    # recompute from the final joint angle: R(z, q) x q0 in xyzw
    qj = float(state.sim.joint_q[0])
    q0_wxyz = jnp.asarray([0.151, 0.691, -0.151, 0.691])
    expect = maths.quat_to_xyzw(
        maths.quat_mul(
            maths.axis_angle_quat(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(qj)),
            q0_wxyz,
        )
    )
    np.testing.assert_allclose(q_final, np.asarray(expect), atol=1e-5)


def test_reset_quats_match_reference_for_all_50():
    """obs[7:11] (and [14:18] for two-object envs) at reset equals the
    reference's recorded reset quat for every task."""
    for name in registry.ALL_V3_ENVIRONMENTS:
        d = np.load(f"tests/golden/{name}.npz")
        rand = np.zeros(12)
        rv = d["attr_last_rand_vec"]
        rand[: rv.shape[0]] = rv
        spec = registry.get_spec(name)
        _, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
        o, r = np.asarray(obs), d["obs0"]
        np.testing.assert_allclose(o[7:11], r[7:11], atol=0.02, err_msg=name)
        if spec.n_obs_obj == 2:
            np.testing.assert_allclose(o[14:18], r[14:18], atol=0.02,
                                       err_msg=name)


def test_per_pad_forces_distinct_on_one_sided_contact():
    """Graze an object with one pad only: a single pad reports force, so
    touching_main_object stays False (ref sawyer_xyz_env.py:440 needs both
    pads loaded); a caged squeeze loads both."""
    spec = registry.get_spec("push-v3")
    rand = np.zeros(12)
    rv = np.random.default_rng(3).uniform(spec.rand_low, spec.rand_high)
    rand[: rv.shape[0]] = rv
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    step = jax.jit(lambda s, a: env_step(spec, s, a))
    from metaworld_tpu.policies import get_policy

    pol = jax.jit(get_policy("push-v3"))
    saw_two_sided = False
    for _ in range(150):
        state, out = step(state, pol(obs))
        obs = out.obs
        fl = float(state.sim.pad_force_l)
        fr = float(state.sim.pad_force_r)
        if fl > 0 and fr > 0:
            saw_two_sided = True
    assert saw_two_sided, "squeeze never loaded both pads"


def test_pad_state_matches_kinematics():
    """sim.pad_l/pad_r track the pad kinematics of the current hand pose."""
    from metaworld_tpu.physics import engine

    spec = registry.get_spec("reach-v3")
    rand = np.zeros(12)
    rv = np.random.default_rng(1).uniform(spec.rand_low, spec.rand_high)
    rand[: rv.shape[0]] = rv
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    step = jax.jit(lambda s, a: env_step(spec, s, a))
    state, out = step(state, jnp.array([0.3, 0.2, -0.1, 0.5]))
    l, r = engine.pad_kinematics(state.sim.hand, state.sim.gripper)
    np.testing.assert_allclose(np.asarray(state.sim.pad_l), np.asarray(l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.sim.pad_r), np.asarray(r), atol=1e-6)
