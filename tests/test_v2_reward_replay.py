"""Step-level v2 reward parity across all 50 tasks.

Replays each reference golden trace through OUR reward function: the
post-step observation, action, and tcp come from the reference recording;
reset-time margins come from our own env_reset on the same task vector.
A step counts as mismatched only if it is off by >5% AND >0.25 absolute.

Replay limits (not engine errors — closed-loop success and the reach-slice
exact test cover those paths):
* a few tasks' rewards read rotating-body geometry the obs doesn't carry
  (assembly/disassemble wrench COM, hammer head, stick end) — the replay
  approximates them with fixed offsets, so they get loose/exempt bounds;
* gates at exact thresholds (the drawer-close success bonus) can flip on
  sub-mm replay error — covered by the small step budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset
from metaworld_tpu.physics import engine

_UNMUT = {
    "door-open-v3": lambda o: o + np.eye(1, 39, 4)[0] * 0.05,
    "door-close-v3": lambda o: o - (np.eye(1, 39, 4)[0] * 0.05
                                    + np.eye(1, 39, 5)[0] * 0.12
                                    + np.eye(1, 39, 6)[0] * 0.1),
}

# max fraction of mismatched steps (default 0.02)
_BOUNDS = {
    "sweep-into-v3": 0.06,      # caging-grip component noise
    "door-open-v3": 0.06,       # door angle re-derived from the obs handle
    "peg-insert-side-v3": 0.10,  # pegHead approximated as obs + const
    "stick-pull-v3": 0.04,      # stick-end site under stick rotation
    "hammer-v3": 0.03,
    "assembly-v3": 0.04,  # caging on the threshed handle is obs-approximate
}
# assembly/disassemble rewards read the nut COM via sim.obj_pos (exact in
# our engine); the replay injects it from the recorded reference qpos
_QPOS_OBJ = {"assembly-v3", "disassemble-v3"}
_EXEMPT = set()


@pytest.mark.parametrize("name", registry.ALL_V3_ENVIRONMENTS)
def test_v2_reward_replay(name):
    if name in _EXEMPT:
        pytest.skip("reward reads rotating-body geometry not in the obs")
    d = np.load(f"tests/golden/{name}.npz")
    QPOS = d["qpos"] if name in _QPOS_OBJ else None
    spec = registry.get_spec(name)
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    state, _ = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    OBS = d["obs"].copy()
    if name in _UNMUT:
        OBS = _UNMUT[name](OBS)

    inject_obj = name in ("stick-pull-v3", "stick-push-v3")
    is_hammer = name == "hammer-v3"
    has_joint = bool(np.asarray(spec.scene.joint_exists).any())

    def one(o, a, tcp, qp):
        sim = state.sim.replace(hand=tcp, gripper=jnp.clip(o[3], 0.0, 1.0))
        if inject_obj:
            sim = sim.replace(obj_pos=sim.obj_pos.at[0].set(o[4:7]))
        if qp is not None:
            sim = sim.replace(obj_pos=sim.obj_pos.at[0].set(qp[9:12]))
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

    f = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None if QPOS is None else 0)))
    qp_arg = None if QPOS is None else jnp.asarray(QPOS[1:])
    ours = np.asarray(f(jnp.asarray(OBS[1:]), jnp.asarray(d["action"][:-1]),
                        jnp.asarray(d["tcp"][1:]), qp_arg))
    ref = d["reward"][:-1]
    err = np.abs(ours - ref)
    rel = err / np.maximum(0.5, np.abs(ref))
    bad = (rel > 0.05) & (err > 0.25)
    bound = _BOUNDS.get(name, 0.02)
    assert bad.mean() <= bound, (
        f"{name}: {bad.mean():.1%} steps mismatch (bound {bound:.0%}); "
        f"worst abs {err.max():.2f} at t={int(err.argmax())}")
