"""Regression guards for the kinematic press-contact model.

Each test pins a failure mode that was observed (and fixed) while
calibrating the fixture engine against the reference's golden traces:

* a lateral graze must SHOVE a hinged door at hand speed, not slam it to
  its range stop (move-capped projection);
* an OPEN claw is two plates around a void — it must descend AROUND a
  drawer handle bar (gated center-tip) and then drag the bar with a
  plate face (the reference's open-claw drawer hook,
  ref sawyer_drawer_v3.py + sawyer_drawer.xml geom50);
* a coasting low-damping fixture that catches up to a claw part must
  decelerate onto it (dissipative inelastic velocity bounds), not derive
  a bogus bounce velocity and glide back shut;
* the wrist/knuckle BLOCK pushes window bars the fingertip sphere
  misses laterally (ref sawyer_window_horizontal.xml geom47, compiled
  right_hand mesh bbox).

All rollouts drive the public jitted step with hand-authored mocap
deltas (action = 0.01 m per unit, types.ACTION_SCALE).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset, env_step


def _init(name, rand3):
    spec = registry.get_spec(name)
    rand = np.zeros(12)
    rand[:3] = rand3
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    step = jax.jit(lambda s, a: env_step(spec, s, a))
    return spec, state, step


def _drive_to(state, step, target, grip, steps, tol=0.005):
    """Proportional mocap servo toward a world target point."""
    for _ in range(steps):
        hand = np.asarray(state.sim.hand)
        err = np.asarray(target) - hand
        act = np.clip(err * 20.0, -1.0, 1.0)
        state, out = step(state, jnp.asarray([*act, grip]))
        if np.linalg.norm(np.asarray(state.sim.hand) - np.asarray(target)) < tol:
            break
    return state, out


def test_door_graze_does_not_slam():
    """Sweeping the hand laterally through the door handle's neighborhood
    shoves the door by at most the swept distance over the lever — it must
    NOT fly to the -2.0 range stop (uncapped lateral-entry projection did
    exactly that: q jumped 0 -> -1.1 rad during a 20-step approach)."""
    _, state, step = _init("door-open-v3", [0.06, 0.866, 0.15])
    # sweep across the handle zone at handle height, claw lightly closed
    state, _ = _drive_to(state, step, [0.15, 0.66, 0.2], 0.6, 60)
    for _ in range(30):
        state, _ = step(state, jnp.asarray([1.0, -0.2, -0.3, 0.6]))
    q = float(state.sim.joint_q[0])
    assert q > -0.6, f"door slammed open by a graze: q={q}"


def test_open_claw_descends_around_drawer_bar():
    """With the claw OPEN the hand must sink to the drawer handle's height
    (the bar passes between the pads); a phantom center-tip contact used
    to stall the approach 4 cm in front of the handle face."""
    _, state, step = _init("drawer-open-v3", [0.02, 0.9, 0.0])
    # handle at (0.02, 0.73, 0.09); approach from the front and above
    state, _ = _drive_to(state, step, [0.02, 0.70, 0.25], -1.0, 60)
    state, _ = _drive_to(state, step, [0.02, 0.725, 0.085], -1.0, 80)
    hand = np.asarray(state.sim.hand)
    assert hand[2] < 0.10, f"open claw blocked above the bar: z={hand[2]:.3f}"
    assert hand[1] > 0.705, f"open claw walled off in front: y={hand[1]:.3f}"
    # plate rub during the descent may drag the drawer a little, but the
    # approach must not press it meaningfully open
    assert float(state.sim.joint_q[0]) < 0.06, "approach alone opened the drawer"


def test_drawer_tracks_pulling_claw_without_tunneling():
    """Pulling the straddled bar drags the drawer open, and when the hand
    STOPS the drawer must stop with it (within its short damping coast) —
    the uncorrected projection velocity let the coasting drawer tunnel
    through the trailing plate and glide fully shut again."""
    _, state, step = _init("drawer-open-v3", [0.02, 0.9, 0.0])
    # full-length servo (tol=0): the pull's claw-bar registration must be
    # deterministic, not dependent on where the approach happened to stop
    state, _ = _drive_to(state, step, [0.02, 0.70, 0.25], -1.0, 60, tol=0.0)
    state, _ = _drive_to(state, step, [0.02, 0.725, 0.085], -1.0, 80, tol=0.0)
    # pull toward the robot until the drawer is well open, then freeze
    q_pull = 0.0
    for _ in range(60):
        state, _ = step(state, jnp.asarray([0.0, -0.6, 0.0, -1.0]))
        q_pull = float(state.sim.joint_q[0])
        if q_pull > 0.12:
            break
    assert q_pull > 0.12, f"drawer did not follow the pulling claw: q={q_pull}"
    # freeze the hand; the drawer must not glide back shut
    for _ in range(40):
        state, _ = step(state, jnp.asarray([0.0, 0.0, 0.0, -1.0]))
    q_hold = float(state.sim.joint_q[0])
    assert q_hold > q_pull - 0.04, (
        f"drawer glided back through the claw: {q_pull:.3f} -> {q_hold:.3f}")


def test_knuckle_block_pushes_window_bar():
    """The window bar (z-capsule at bar height 0.115-0.205) is pushed by
    the WRIST block riding 0.105 above the tcp — a tcp-level sweep whose
    fingertip passes below the bar must still open the window (the
    fingertip-sphere-only model missed this contact by 4 mm laterally)."""
    _, state, step = _init("window-open-v3", [0.02, 0.73, 0.16])
    # descend in front of/next to the bar, then sweep +x at table level
    state, _ = _drive_to(state, step, [-0.1, 0.61, 0.05], 0.3, 80)
    for _ in range(80):
        state, _ = step(state, jnp.asarray([1.0, 0.0, 0.0, 0.3]))
    q = float(state.sim.joint_q[0])
    assert q > 0.10, f"knuckle sweep failed to slide the window: q={q}"


def test_open_claw_plate_presses_side_button():
    """Side buttons are pressed by the pad plate's front face when the
    claw is open (the gated tip is immaterial); the 6 mm edge probes used
    to tunnel through the cap and stall the press at ~30% depth."""
    _, state, step = _init("button-press-v3", [0.0, 0.85, 0.115])
    # button face at y ~= 0.657, z=0.115; press straight in +y and track
    # the deepest press (an over-driven open-loop hand eventually slides
    # past the cap, as MuJoCo's soft contact also allows)
    state, _ = _drive_to(state, step, [0.0, 0.60, 0.115], -1.0, 60)
    q_max = 0.0
    for _ in range(40):
        state, _ = step(state, jnp.asarray([0.0, 0.6, 0.0, -1.0]))
        q_max = max(q_max, float(state.sim.joint_q[0]))
    assert q_max > 0.05, f"open-claw plate press stalled: q_max={q_max}"


def test_closed_tip_is_material():
    """With the claw CLOSED the center tip presses (golden button
    calibration: the topdown cap yields under the descending closed
    claw)."""
    _, state, step = _init("button-press-topdown-v3", [0.02, 0.82, 0.115])
    state, _ = _drive_to(state, step, [0.02, 0.816, 0.35], 1.0, 70)
    for _ in range(70):
        state, _ = step(state, jnp.asarray([0.0, 0.0, -0.6, 1.0]))
    q = float(state.sim.joint_q[0])
    assert q > 0.05, f"closed-claw topdown press stalled: q={q}"
