"""Step-level v2 reward parity across all 50 tasks.

Replays each reference golden trace through OUR reward function: the
post-step observation, action, tcp, finger pads, and (for free-joint
objects) the body pose from qpos come from the reference recording;
reset-time margins come from our own env_reset on the same task vector.
Rewards read exactly what the reference reads — obs where it reads obs,
sim state where it reads mjData — so the replay measures the reward
formulas themselves, with no geometric approximations.
A step counts as mismatched only if it is off by >5% AND >0.25 absolute.

The residual budgets cover gates sitting at exact thresholds (sub-mm
replay error can flip e.g. the drawer-close success bonus) and joint
coordinates re-derived from the obs handle position.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset
from metaworld_tpu.physics import engine, maths

# max fraction of mismatched steps
_BOUNDS = {}


@pytest.mark.parametrize("name", registry.ALL_V3_ENVIRONMENTS)
def test_v2_reward_replay(name):
    d = np.load(f"tests/golden/{name}.npz")
    spec = registry.get_spec(name)
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    state, _ = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    OBS = d["obs"].copy()

    # free-joint main object: qpos carries the body pos + quat (wxyz) at
    # the model's joint offset — 9 (after the 7 arm + 2 finger dofs) for
    # most scenes, 0 for the coffee scenes whose mug joint is declared
    # first; inject both (delta quat = q x q0^-1, engine convention)
    _FREE_OFF = 0 if name.startswith("coffee-") else 9
    has_free = d["qpos"].shape[1] >= 16 and bool(np.asarray(spec.scene.obj_exists)[0])
    QPOS = d["qpos"] if has_free else None
    q0_abs = d["qpos"][0][_FREE_OFF + 3:_FREE_OFF + 7] if has_free else None
    is_hammer = name == "hammer-v3"
    has_joint = bool(np.asarray(spec.scene.joint_exists).any())

    def one(o, a, tcp, lp, rp, qp):
        sim = state.sim.replace(hand=tcp, gripper=jnp.clip(o[3], 0.0, 1.0),
                                pad_l=lp, pad_r=rp)
        if qp is not None:
            q_delta = maths.quat_mul(qp[_FREE_OFF + 3:_FREE_OFF + 7],
                                     maths.quat_conj(jnp.asarray(q0_abs)))
            sim = sim.replace(
                obj_pos=sim.obj_pos.at[0].set(qp[_FREE_OFF:_FREE_OFF + 3]),
                obj_quat=sim.obj_quat.at[0].set(q_delta),
            )
        if is_hammer:
            sim = sim.replace(joint_q=sim.joint_q.at[0].set(o[12] - 0.64))
        elif has_joint:
            q = engine.fixture_inverse(spec.scene_device, sim.fixture_pos,
                                       o[4:7])
            q = jnp.clip(q, spec.scene_device.joint_range[:, 0],
                         spec.scene_device.joint_range[:, 1])
            sim = sim.replace(joint_q=q * spec.scene_device.joint_exists)
        st = state.replace(sim=sim)
        return spec.reward_fn(spec, st, o, a).reward

    f = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0,
                                       None if QPOS is None else 0)))
    qp_arg = None if QPOS is None else jnp.asarray(QPOS[1:])
    ours = np.asarray(f(jnp.asarray(OBS[1:]), jnp.asarray(d["action"][:-1]),
                        jnp.asarray(d["tcp"][1:]), jnp.asarray(d["leftpad"][1:]),
                        jnp.asarray(d["rightpad"][1:]), qp_arg))
    ref = d["reward"][:-1]
    err = np.abs(ours - ref)
    rel = err / np.maximum(0.5, np.abs(ref))
    bad = (rel > 0.05) & (err > 0.25)
    bound = _BOUNDS.get(name, 0.02)
    assert bad.mean() <= bound, (
        f"{name}: {bad.mean():.1%} steps mismatch (bound {bound:.0%}); "
        f"worst abs {err.max():.2f} at t={int(err.argmax())}")
