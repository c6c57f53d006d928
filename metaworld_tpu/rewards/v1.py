"""Legacy "v1" reward family for all 50 tasks.

Every reference env accepts ``reward_function_version="v1"`` (ref
sawyer_xyz_env.py:187) selecting the pre-2020 reward branch of its
``compute_reward`` (the ``else:`` arm, e.g. sawyer_reach_v3.py:150-162,
sawyer_pick_place_v3.py:300-370). This module reimplements that whole family
as pure jit/vmap-safe functions of ``(spec, state, obs, action)``:

* ``fingerCOM`` in the reference is the midpoint of the two EndEffector
  sites == ``tcp_center`` == ``obs[:3]``. A handful of tasks (button-press,
  coffee-button, button-press-wall, handle-press/-side, handle-pull/-side)
  use the LEFT finger site only; that site sits half a gripper opening in +y
  off the tcp, i.e. ``obs[:3] + (0, 0.05*obs[3], 0)`` (calibrated against the
  reference: residual < 4e-4 m).
* The reference caches reset-time margins (``maxReachDist``/``maxPushDist``/
  ``maxPlacingDist``/...) on the stateful env. Here they are recomputed each
  step from reset-time entries of ``EnvState`` (obj_init_pos/init_tcp/
  target/hand_init) — pure data flow, fused by XLA into the step program.
* The reference's "latches" (``self.pickCompleted``/``reachCompleted``/
  ``placeCompleted``) are all recomputed from scratch every step in the v1
  branch, so the functions here are genuinely stateless.
* Info metrics replicate each env's (version-shared) ``evaluate_state``
  applied to the v1 return tuple — including the quirks that zeroed tuple
  slots produce (e.g. ``near_object`` pinned to 1.0 where the gate is
  ``tcp_to_obj <= 0.05`` and the v1 branch returns 0.0 for that slot).

Faithfully preserved reference quirks (do not "fix"):
* button-press-wall gates pressDist on y but its maxDist is measured on z
  (sawyer_button_press_wall_v3.py:124 vs :215).
* coffee-pull's ``reachDistxy`` is the norm of the *point* (obj_x, obj_y,
  init_tcp_z), not of a difference (sawyer_coffee_pull_v3.py:227-229).
* stick-push / stick-pull read ``objPos = obs[6:9]`` — a slice straddling
  the stick z and its quaternion under the v3 obs layout
  (sawyer_stick_push_v3.py:355, stick_pull:300).
* handle-pull's maxDist uses the *body-local* handleStart site z (0.022),
  not its world position (sawyer_handle_pull_v3.py:116-118).
* window-open/close never clamp pullRew to >= 0 (sawyer_window_open_v3.py),
  so their v1 reward can go below -reachDist.
* sweep / sweep-into zero the reach term once the puck has fallen into the
  hole (objPos z < init z - 0.05).
"""

from __future__ import annotations

import jax.numpy as jnp

from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import maths

C1, C2, C3 = 1000.0, 0.01, 0.001
H_SCALE = 100.0


def _norm(v):
    return jnp.linalg.norm(v)


def _bonus(d, max_d, c2=C2, c3=C3):
    """1000*(maxDist - d) + 1000*(exp(-d^2/c2) + exp(-d^2/c3)) — the shared
    shaping of every v1 reward (e.g. sawyer_reach_v3.py:156-159)."""
    return 1000.0 * (max_d - d) + C1 * (jnp.exp(-(d**2) / c2) + jnp.exp(-(d**2) / c3))


def _tcp(state):
    """fingerCOM == midpoint of the EndEffector sites == tcp_center — the
    engine's tracked hand point (NOT obs[:3], which is the end-effector
    body ~4.4 cm above the tcp)."""
    return state.sim.hand


def _left_finger(state, obs):
    """leftEndEffector site: tcp + half the gripper opening in +y."""
    return state.sim.hand + jnp.array([0.0, 0.05, 0.0]) * obs[3]


def _grip_bonus(action):
    return jnp.maximum(action[-1], 0.0) / 50.0


# ---------------------------------------------------------------- templates


def _press_family(obs, action, state, *, finger, dist_axis, max_axis,
                  success_radius, grasp_one=False):
    """-reachDist + gated press bonus (buttons, handles, drawer-close,
    plate-slides use the same shape with different axes/margins)."""
    obj = obs[4:7]
    fc = _left_finger(state, obs) if finger == "left" else _tcp(state)
    press_dist = jnp.abs(obj[dist_axis] - state.target[dist_axis])
    reach_dist = _norm(obj - fc)
    max_dist = jnp.abs(state.obj_init_pos[0, max_axis] - state.target[max_axis])
    press_rew = jnp.where(reach_dist < 0.05, _bonus(press_dist, max_dist), 0.0)
    press_rew = jnp.maximum(press_rew, 0.0)
    reward = -reach_dist + press_rew
    return common.eval_out(
        reward=reward,
        success=(press_dist <= success_radius).astype(jnp.float32),
        near_object=1.0,                       # tuple slot tcp_to_obj == 0.0
        grasp_success=1.0 if grasp_one else 0.0,
        obj_to_target=press_dist,
    )


def _pull_gated(obs, state, *, dist_fn, max_fn, success_radius,
                near_one=True, grasp_one=False, c2=C2, c3=C3, clamp=True):
    """reachRew + pullRew gated on reachCompleted (doors/faucets/lever/
    drawer-open/windows/dial)."""
    obj = obs[4:7]
    fc = _tcp(state)
    pull_dist = dist_fn(obj, state)
    reach_dist = _norm(obj - fc)
    pull_rew = _bonus(pull_dist, max_fn(state), c2=c2, c3=c3)
    if clamp:
        pull_rew = jnp.maximum(pull_rew, 0.0)
    pull_rew = jnp.where(reach_dist < 0.05, pull_rew, 0.0)
    reward = -reach_dist + pull_rew
    return common.eval_out(
        reward=reward,
        success=(pull_dist <= success_radius).astype(jnp.float32),
        near_object=1.0 if near_one else 0.0,
        grasp_success=1.0 if grasp_one else 0.0,
        obj_to_target=pull_dist,
    )


def _push_simple(obs, state, *, success_radius, obj_to_target_3d=False,
                 success_on_3d=False):
    """reachRew + pushRew gated on reachDist < 0.05, xy distances
    (push/push-wall/push-back/coffee-push/soccer)."""
    obj = obs[4:7]
    fc = _tcp(state)
    reach_dist = _norm(fc - obj)
    push_dist = _norm(obj[:2] - state.target[:2])
    max_push = _norm(state.obj_init_pos[0, :2] - state.target[:2])
    push_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(push_dist, max_push), 0.0), 0.0)
    reward = -reach_dist + push_rew
    o2t = _norm(obj - state.target) if obj_to_target_3d else push_dist
    succ = o2t if success_on_3d else push_dist
    return common.eval_out(
        reward=reward,
        success=(succ <= success_radius).astype(jnp.float32),
        near_object=1.0,
        obj_to_target=o2t,
    )


def _reach_xyz_gated(obs, action, state, *, obj, xy_thresh=0.05, z_scale=2.0,
                     grip_gate=0.05, z_ref=None):
    """The pick-family reach term: -reachDist when the tcp is over the
    object in xy, else -reachDistxy - z_scale*zRew; grip bonus when close."""
    fc = _tcp(state)
    z_ref = state.init_tcp[2] if z_ref is None else z_ref
    reach_dist = _norm(obj - fc)
    reach_xy = _norm(obj[:2] - fc[:2])
    z_rew = jnp.abs(fc[2] - z_ref)
    reach_rew = jnp.where(reach_xy < xy_thresh, -reach_dist,
                          -reach_xy - z_scale * z_rew)
    reach_rew = jnp.where(reach_dist < grip_gate,
                          -reach_dist + _grip_bonus(action), reach_rew)
    return reach_rew, reach_dist


def _pick_rew(obj_z, height_target, obj_height, reach_dist, dropped,
              pick_done, *, reach_gate=0.1, z_offset=0.0):
    """hScale ladder shared by the pick family (e.g.
    sawyer_pick_place_v3.py:330-345)."""
    full = H_SCALE * (height_target + z_offset)
    partial = H_SCALE * (jnp.minimum(height_target, obj_z) + z_offset)
    return jnp.where(
        pick_done & ~dropped, full,
        jnp.where((reach_dist < reach_gate) & (obj_z > obj_height + 0.005),
                  partial, 0.0))


def _pick_place_family(obs, action, state, *, success_radius=0.07,
                       lift_thresh, placing_3d=True, max_placing_fn=None,
                       xy_thresh=0.05, z_scale=2.0):
    """The standard v1 pick&place template (pick-place, pick-place-wall,
    basketball, box-close, shelf-place)."""
    obj = obs[4:7]
    obj_height = state.obj_init_pos[0, 2]
    height_target = obj_height + lift_thresh
    placing_dist = (_norm(obj - state.target) if placing_3d
                    else _norm(obj[:2] - state.target[:2]))
    reach_rew, reach_dist = _reach_xyz_gated(
        obs, action, state, obj=obj, xy_thresh=xy_thresh, z_scale=z_scale)
    pick_done = obj[2] >= height_target - 0.01
    dropped = (obj[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = _pick_rew(obj[2], height_target, obj_height, reach_dist,
                         dropped, pick_done)
    if max_placing_fn is None:
        max_placing = _norm(
            jnp.array([state.obj_init_pos[0, 0], state.obj_init_pos[0, 1],
                       height_target]) - state.target) + height_target
    else:
        max_placing = max_placing_fn(state, height_target)
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    place_rew = jnp.where(
        cond, jnp.maximum(_bonus(placing_dist, max_placing), 0.0), 0.0)
    reward = reach_rew + pick_rew + place_rew
    return reward, placing_dist, reach_dist


# ------------------------------------------------------------ per-task fns
# Signature matches TaskSpec.reward_fn: (spec, state, obs, action) -> EvalOut


# the reference's settled tcp after _reset_hand: hand_init + this constant
# (measured; our own settle differs by ~3 mm, which would bias the reach
# margin by 1000x that)
_REF_SETTLE_OFF = (0.0044, 0.0015, -0.0498)


def _ref_init_tcp(state):
    return state.hand_init + jnp.asarray(_REF_SETTLE_OFF)


def v1_reach(spec, state, obs, action):
    """ref sawyer_reach_v3.py:150-162 (v1 branch)."""
    reach_dist = _norm(_tcp(state) - state.target)
    max_reach = _norm(_ref_init_tcp(state) - state.target)
    reward = jnp.maximum(_bonus(reach_dist, max_reach), 0.0)
    return common.eval_out(
        reward=reward, success=(reach_dist <= 0.05).astype(jnp.float32),
        near_object=reach_dist, grasp_success=1.0, grasp_reward=reach_dist,
        obj_to_target=reach_dist)


def v1_reach_wall(spec, state, obs, action):
    """ref sawyer_reach_wall_v3.py (v1): same formula; evaluate_state maps
    the tuple differently (near/grasp zeroed)."""
    reach_dist = _norm(_tcp(state) - state.target)
    max_reach = _norm(_ref_init_tcp(state) - state.target)
    reward = jnp.maximum(_bonus(reach_dist, max_reach), 0.0)
    return common.eval_out(
        reward=reward, success=(reach_dist <= 0.05).astype(jnp.float32),
        obj_to_target=reach_dist)


def v1_push(spec, state, obs, action):
    """ref sawyer_push_v3.py (v1)."""
    return _push_simple(obs, state, success_radius=0.05)


def v1_push_wall(spec, state, obs, action):
    return _push_simple(obs, state, success_radius=0.07)


def v1_push_back(spec, state, obs, action):
    return _push_simple(obs, state, success_radius=0.07)


def v1_coffee_push(spec, state, obs, action):
    """ref sawyer_coffee_push_v3.py (v1): obj_to_target reported in 3D."""
    return _push_simple(obs, state, success_radius=0.07,
                        obj_to_target_3d=True, success_on_3d=True)


def v1_soccer(spec, state, obs, action):
    return _push_simple(obs, state, success_radius=0.07)


def v1_coffee_pull(spec, state, obs, action):
    """ref sawyer_coffee_pull_v3.py:220-250 (v1). NB `reachDistxy` is the
    norm of the point (obj_x, obj_y, init_tcp_z) — preserved as-is."""
    obj = obs[4:7]
    fc = _tcp(state)
    reach_dist = _norm(fc - obj)
    pull_dist = _norm(obj[:2] - state.target[:2])
    weird_xy = _norm(jnp.array([obj[0], obj[1], state.init_tcp[2]]))
    reach_rew = jnp.where(
        weird_xy < 0.05,
        -reach_dist + 0.1 + jnp.where(reach_dist < 0.05, _grip_bonus(action), 0.0),
        -weird_xy)
    max_pull = _norm(state.obj_init_pos[0, :2] - state.target[:2])
    pull_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(pull_dist, max_pull), 0.0), 0.0)
    reward = reach_rew + pull_rew
    o2t = _norm(obj - state.target)
    return common.eval_out(
        reward=reward, success=(o2t <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=o2t)


def v1_sweep_into(spec, state, obs, action):
    """ref sawyer_sweep_into_goal_v3.py (v1): reach term zeroed once the
    puck is in the hole (z < init z - 0.05, 0.4 < y < 1.0)."""
    obj = obs[4:7]
    fc = _tcp(state)
    reach_dist = _norm(fc - obj)
    push_dist = _norm(obj[:2] - state.target[:2])
    reach_completed = reach_dist < 0.05
    in_hole = (obj[2] < state.obj_init_pos[0, 2] - 0.05) & (obj[1] > 0.4) & (obj[1] < 1.0)
    reach_rew = jnp.where(in_hole, 0.0, -reach_dist)
    push_dist = jnp.where(in_hole, 0.0, push_dist)
    max_push = _norm(state.obj_init_pos[0, :2] - state.target[:2])
    push_rew = jnp.where(
        reach_completed, jnp.maximum(_bonus(push_dist, max_push), 0.0), 0.0)
    reward = reach_rew + push_rew
    return common.eval_out(
        reward=reward, success=(push_dist <= 0.05).astype(jnp.float32),
        near_object=1.0, obj_to_target=push_dist)


def v1_sweep(spec, state, obs, action):
    """ref sawyer_sweep_v3.py (v1): off-table check has no y bounds."""
    obj = obs[4:7]
    fc = _tcp(state)
    reach_dist = _norm(obj - fc)
    push_dist = _norm(obj[:2] - state.target[:2])
    reach_completed = reach_dist < 0.05
    fell = obj[2] < state.obj_init_pos[0, 2] - 0.05
    reach_rew = jnp.where(fell, 0.0, -reach_dist)
    push_dist = jnp.where(fell, 0.0, push_dist)
    max_push = _norm(state.obj_init_pos[0, :2] - state.target[:2])
    push_rew = jnp.where(
        reach_completed, jnp.maximum(_bonus(push_dist, max_push), 0.0), 0.0)
    reward = reach_rew + push_rew
    return common.eval_out(
        reward=reward, success=(push_dist <= 0.05).astype(jnp.float32),
        near_object=1.0, obj_to_target=push_dist)


def v1_hand_insert(spec, state, obs, action):
    """ref sawyer_hand_insert_v3.py (v1): pure reaching task on the tcp —
    xy reach plus a gated z-descent bonus; margin |hand_init_z - target_z|."""
    fc = _tcp(state)
    reach_xy = _norm(fc[:2] - state.target[:2])
    reach_z = jnp.abs(fc[2] - state.target[2])
    max_reach = jnp.abs(state.hand_init[2] - state.target[2])
    near = jnp.where(reach_xy < 0.05, _bonus(reach_z, max_reach), 0.0)
    reward = -reach_xy + jnp.maximum(near, 0.0)
    o2t = _norm(state.obj_init_pos[0] - state.target)
    return common.eval_out(
        reward=reward, success=(o2t <= 0.05).astype(jnp.float32),
        near_object=1.0, obj_to_target=o2t)


# --- buttons ---------------------------------------------------------------

def v1_button_press_topdown(spec, state, obs, action):
    """ref sawyer_button_press_topdown_v3.py:190-215 (v1)."""
    obj = obs[4:7]
    fc = _tcp(state)
    press_dist = jnp.abs(obj[2] - state.target[2])
    reach_dist = _norm(obj - fc)
    max_dist = jnp.abs(state.obj_init_pos[0, 2] - state.target[2])
    press_rew = jnp.maximum(
        jnp.where(reach_dist < 0.05, _bonus(press_dist, max_dist), 0.0), 0.0)
    reward = -reach_dist + press_rew
    return common.eval_out(
        reward=reward, success=(press_dist <= 0.024).astype(jnp.float32),
        near_object=1.0, obj_to_target=press_dist)


v1_button_press_topdown_wall = v1_button_press_topdown


def v1_button_press(spec, state, obs, action):
    """ref sawyer_button_press_v3.py (v1): left finger, y axis."""
    return _press_family(obs, action, state, finger="left", dist_axis=1,
                         max_axis=1, success_radius=0.02)


def v1_button_press_wall(spec, state, obs, action):
    """ref sawyer_button_press_wall_v3.py (v1): pressDist on y but maxDist
    measured on z (reference quirk)."""
    return _press_family(obs, action, state, finger="left", dist_axis=1,
                         max_axis=2, success_radius=0.03)


def v1_coffee_button(spec, state, obs, action):
    return _press_family(obs, action, state, finger="left", dist_axis=1,
                         max_axis=1, success_radius=0.02)


# --- handles ---------------------------------------------------------------

def v1_handle_press(spec, state, obs, action):
    """ref sawyer_handle_press_v3.py (v1): left finger, z axis."""
    return _press_family(obs, action, state, finger="left", dist_axis=2,
                         max_axis=2, success_radius=0.02, grasp_one=True)


def v1_handle_press_side(spec, state, obs, action):
    return _press_family(obs, action, state, finger="left", dist_axis=2,
                         max_axis=2, success_radius=0.02, grasp_one=True)


def _v1_handle_pull(obs, action, state, *, max_dist, success_radius):
    obj = obs[4:7]
    fc = _left_finger(state, obs)
    press_dist = jnp.abs(obj[2] - state.target[2])
    reach_dist = _norm(obj - fc)
    press_rew = jnp.maximum(
        jnp.where(reach_dist < 0.05, _bonus(press_dist, max_dist), 0.0), 0.0)
    reward = -reach_dist + press_rew
    return common.eval_out(
        reward=reward, success=(press_dist <= success_radius).astype(jnp.float32),
        near_object=1.0, obj_to_target=press_dist)


def v1_handle_pull(spec, state, obs, action):
    """ref sawyer_handle_pull_v3.py (v1): maxDist from the BODY-LOCAL
    handleStart z (0.022, handle_press.xml:11) — reference quirk."""
    return _v1_handle_pull(obs, action, state,
                           max_dist=jnp.abs(0.022 - state.target[2]),
                           success_radius=0.05)


def v1_handle_pull_side(spec, state, obs, action):
    # the handleStart site sits 0.022 above the observed handle point, and
    # the reference margin is site-based (sawyer_handle_pull_side_v3.py:116)
    return _v1_handle_pull(
        obs, action, state,
        max_dist=jnp.abs(state.obj_init_pos[0, 2] + 0.022 - state.target[2]),
        success_radius=0.08)


# --- fixtures: doors / faucets / drawers / windows / dial / lever ---------

def v1_door_open(spec, state, obs, action):
    """ref sawyer_door_v3.py:200-230 (v1): xy pull gated on reach."""
    obj = obs[4:7]
    fc = _tcp(state)
    pull_dist = _norm(obj[:2] - state.target[:2])
    reach_dist = _norm(obj - fc)
    # the reference margin is the handle geom xpos at reset, which matches
    # our handle obs init (measured: |delta| < 3e-4)
    max_pull = _norm(state.obj_init_pos[0, :2] - state.target[:2])
    pull_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(pull_dist, max_pull), 0.0), 0.0)
    reward = -reach_dist + pull_rew
    return common.eval_out(
        reward=reward,
        success=(jnp.abs(obs[4] - state.target[0]) <= 0.08).astype(jnp.float32))


def v1_door_close(spec, state, obs, action):
    obj = obs[4:7]
    fc = _tcp(state)
    pull_dist = _norm(obj[:2] - state.target[:2])
    reach_dist = _norm(obj - fc)
    # obj_init_pos is the DOOR BODY (v2 margins need it); the v1 margin is
    # the fresh handle-geom read at reset = body + pivot + open-pose arm
    handle0 = state.obj_init_pos[0, :2] + jnp.array([-0.2922, -0.4757])
    max_pull = _norm(handle0 - state.target[:2])
    pull_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(pull_dist, max_pull), 0.0), 0.0)
    reward = -reach_dist + pull_rew
    return common.eval_out(
        reward=reward, success=(pull_dist <= 0.08).astype(jnp.float32),
        grasp_success=1.0, grasp_reward=1.0, obj_to_target=pull_dist)


def v1_door_lock(spec, state, obs, action):
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: _norm(o - s.target),
        max_fn=lambda s: _norm(s.target - s.obj_init_pos[0]),
        success_radius=0.02)


v1_door_unlock = v1_door_lock


def v1_faucet_open(spec, state, obs, action):
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: _norm(o - s.target),
        max_fn=lambda s: _norm(s.target - s.obj_init_pos[0]),
        success_radius=0.07, grasp_one=True)


v1_faucet_close = v1_faucet_open


def v1_lever_pull(spec, state, obs, action):
    """ref sawyer_lever_pull_v3.py (v1); evaluate_state compares the tuple's
    lever_error slot (= pullDist here) against pi/24."""
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: _norm(o - s.target),
        # ref obj_init_pos is the lever BASE body; target = base +
        # (0.12, 0, 0.45), so the margin is constant
        max_fn=lambda s: _norm(jnp.array([0.12, 0.0, 0.45])),
        success_radius=jnp.pi / 24)


def v1_dial_turn(spec, state, obs, action):
    """ref sawyer_dial_turn_v3.py (v1): y-distance, sharper exps
    (c2=1e-3, c3=1e-4)."""
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: jnp.abs(o[1] - s.target[1]),
        max_fn=lambda s: jnp.abs(s.target[1] - s.obj_init_pos[0, 1]),
        success_radius=0.07, grasp_one=True, c2=0.001, c3=0.0001)


def v1_drawer_open(spec, state, obs, action):
    """ref sawyer_drawer_open_v3.py (v1): fixed maxDist=0.2."""
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: jnp.abs(o[1] - s.target[1]),
        max_fn=lambda s: 0.2,
        success_radius=0.03)


def v1_drawer_close(spec, state, obs, action):
    """ref sawyer_drawer_close_v3.py (v1): fixed maxDist=0.15; success uses
    TARGET_RADIUS(0.05)+0.015."""
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: jnp.abs(o[1] - s.target[1]),
        max_fn=lambda s: 0.15,
        success_radius=0.065, grasp_one=True)


def v1_window_open(spec, state, obs, action):
    """ref sawyer_window_open_v3.py (v1): x-distance, fixed maxDist=0.2,
    pullRew NOT clamped to >= 0 (reference quirk)."""
    return _pull_gated(
        obs, state,
        dist_fn=lambda o, s: jnp.abs(o[0] - s.target[0]),
        max_fn=lambda s: 0.2,
        success_radius=0.05, grasp_one=True, clamp=False)


v1_window_close = v1_window_open


# --- plate slides ----------------------------------------------------------

def v1_plate_slide(spec, state, obs, action):
    """ref sawyer_plate_slide_v3.py (v1) — identical across all four
    plate-slide variants."""
    obj = obs[4:7]
    fc = _tcp(state)
    reach_dist = _norm(obj - fc)
    pull_dist = _norm(obj[:2] - state.target[:2])
    max_dist = _norm(state.obj_init_pos[0, :2] - state.target[:2])
    pull_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(pull_dist, max_dist), 0.0), 0.0)
    reward = -reach_dist + pull_rew
    return common.eval_out(
        reward=reward, success=(pull_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=pull_dist)


def v1_plate_slide_back_side(spec, state, obs, action):
    """plate-slide-back-side reads the puck geom BEFORE mj_forward
    (sawyer_plate_slide_back_side_v3.py:141), i.e. the stale XML pose 0.1 m
    +x of the randomized body — its maxDist margin is off by exactly that."""
    obj = obs[4:7]
    fc = _tcp(state)
    reach_dist = _norm(obj - fc)
    pull_dist = _norm(obj[:2] - state.target[:2])
    stale_init = state.obj_init_pos[0, :2] + jnp.array([0.1, 0.0])
    max_dist = _norm(stale_init - state.target[:2])
    pull_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(pull_dist, max_dist), 0.0), 0.0)
    reward = -reach_dist + pull_rew
    return common.eval_out(
        reward=reward, success=(pull_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=pull_dist)


# --- pick & place family ---------------------------------------------------

def v1_pick_place(spec, state, obs, action):
    """ref sawyer_pick_place_v3.py:300-370 (v1)."""
    reward, placing_dist, _ = _pick_place_family(
        obs, action, state, lift_thresh=0.04)
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=placing_dist)


v1_pick_place_wall = v1_pick_place


def v1_basketball(spec, state, obs, action):
    """ref sawyer_basketball_v3.py (v1): liftThresh=0.3, success radius
    0.08."""
    reward, placing_dist, _ = _pick_place_family(
        obs, action, state, lift_thresh=0.3)
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.08).astype(jnp.float32),
        near_object=1.0, obj_to_target=placing_dist)


def v1_shelf_place(spec, state, obs, action):
    reward, placing_dist, _ = _pick_place_family(
        obs, action, state, lift_thresh=0.04)
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=placing_dist)


def v1_box_close(spec, state, obs, action):
    """ref sawyer_box_close_v3.py (v1): liftThresh=0.12; success on the full
    3D lid-to-target distance < 0.08; info mostly zeroed (5-tuple).

    The reference objHeight reads the BoxHandleGeom world z (a constant
    0.1473, ~13 cm above the lid obs point), which keeps the v1 pick ladder
    from ever firing on scripted play — preserved as-is."""
    obj = obs[4:7]
    obj_height = 0.1473
    height_target = obj_height + 0.12
    placing_dist = _norm(obj - state.target)
    reach_rew, reach_dist = _reach_xyz_gated(obs, action, state, obj=obj)
    pick_done = obj[2] >= height_target - 0.01
    dropped = (obj[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = _pick_rew(obj[2], height_target, obj_height, reach_dist,
                         dropped, pick_done)
    max_placing = _norm(
        jnp.array([state.obj_init_pos[0, 0], state.obj_init_pos[0, 1],
                   height_target]) - state.target) + height_target
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    place_rew = jnp.where(
        cond, jnp.maximum(_bonus(placing_dist, max_placing), 0.0), 0.0)
    reward = reach_rew + pick_rew + place_rew
    return common.eval_out(
        reward=reward,
        success=(_norm(obs[4:7] - state.target) < 0.08).astype(jnp.float32))


def v1_pick_out_of_hole(spec, state, obs, action):
    """ref sawyer_pick_out_of_hole_v3.py (v1): liftThresh=0.11, pickRew
    ladder offset by (-objHeight + 0.02)."""
    obj = obs[4:7]
    obj_height = state.obj_init_pos[0, 2]
    height_target = obj_height + 0.11
    placing_dist = _norm(obj - state.target)
    reach_rew, reach_dist = _reach_xyz_gated(obs, action, state, obj=obj)
    pick_done = obj[2] >= height_target - 0.01
    dropped = (obj[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = _pick_rew(obj[2], height_target, obj_height, reach_dist,
                         dropped, pick_done, z_offset=-obj_height + 0.02)
    max_placing = _norm(
        jnp.array([state.obj_init_pos[0, 0], state.obj_init_pos[0, 1],
                   height_target]) - state.target) + height_target
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    place_rew = jnp.where(
        cond, jnp.maximum(_bonus(placing_dist, max_placing), 0.0), 0.0)
    reward = reach_rew + pick_rew + place_rew
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=placing_dist)


def v1_bin_picking(spec, state, obs, action):
    """ref sawyer_bin_picking_v3.py:260-330 (v1): xy placing distance,
    placeCompleted short-circuits to -200*grip + placeRew."""
    obj = obs[4:7]
    obj_height = state.obj_init_pos[0, 2]
    height_target = obj_height + 0.1
    placing_dist = _norm(obj[:2] - state.target[:2])
    reach_rew, reach_dist = _reach_xyz_gated(
        obs, action, state, obj=obj, xy_thresh=0.06, z_scale=1.0)
    pick_done = obj[2] >= height_target - 0.01
    dropped = (obj[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    near_goal_xy = (jnp.abs(obj[0] - state.target[0]) < 0.05) & \
                   (jnp.abs(obj[1] - state.target[1]) < 0.05)
    place_completed = near_goal_xy & (obj[2] < obj_height + 0.05)
    pick_rew = jnp.where(
        place_completed | (pick_done & ~dropped), H_SCALE * height_target,
        jnp.where((reach_dist < 0.1) & (obj[2] > obj_height + 0.005),
                  H_SCALE * jnp.minimum(height_target, obj[2]), 0.0))
    max_placing = _norm(state.obj_init_pos[0, :2] - state.target[:2]) + height_target
    place_base = jnp.maximum(_bonus(placing_dist, max_placing), 0.0)
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    place_rew = jnp.where(
        cond, jnp.where(near_goal_xy, -200.0 * action[-1] + place_base, place_base),
        0.0)
    full = reach_rew + pick_rew + place_rew
    reward = jnp.where(place_completed, -200.0 * action[-1] + place_base, full)
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.05).astype(jnp.float32),
        obj_to_target=placing_dist)


def v1_peg_insert_side(spec, state, obs, action):
    """ref sawyer_peg_insertion_side_v3.py (v1): liftThresh=0.11, z_scale=1;
    place bonus switches to the peg-HEAD distance until the head is within
    5 cm of the goal. pegHead = obs + (-0.13, 0, -0.01) (site offset)."""
    obj = obs[4:7]
    peg_head = obj + jnp.array([-0.13, 0.0, -0.01])
    peg_com_init = state.obj_init_pos[0]   # stored as the body com
    obj_height = peg_com_init[2]
    height_target = obj_height + 0.11
    placing_dist = _norm(obj - state.target)
    placing_head = _norm(peg_head - state.target)
    reach_rew, reach_dist = _reach_xyz_gated(
        obs, action, state, obj=obj, z_scale=1.0)
    pick_done = obj[2] >= height_target - 0.01
    dropped = (obj[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = _pick_rew(obj[2], height_target, obj_height, reach_dist,
                         dropped, pick_done)
    max_placing = _norm(
        jnp.array([peg_com_init[0], peg_com_init[1],
                   height_target]) - state.target) + height_target
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    place_rew = jnp.where(
        placing_head <= 0.05,
        _bonus(placing_dist, max_placing),
        _bonus(placing_head, max_placing))
    place_rew = jnp.where(cond, jnp.maximum(place_rew, 0.0), 0.0)
    reward = reach_rew + pick_rew + place_rew
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=placing_dist)


def v1_peg_unplug_side(spec, state, obs, action):
    """ref sawyer_peg_unplug_side_v3.py (v1): xy placing distance, zRew
    referenced to hand_init (not init_tcp)."""
    obj = obs[4:7]
    fc = _tcp(state)
    placing_dist = _norm(obj[:2] - state.target[:2])
    reach_dist = _norm(obj - fc)
    reach_xy = _norm(obj[:2] - fc[:2])
    z_rew = jnp.abs(fc[2] - state.hand_init[2])
    reach_rew = jnp.where(reach_xy < 0.05, -reach_dist, -reach_xy - 2.0 * z_rew)
    reach_rew = jnp.where(reach_dist < 0.05,
                          -reach_dist + _grip_bonus(action), reach_rew)
    max_placing = _norm(state.target - state.obj_init_pos[0])
    place_rew = jnp.where(
        reach_dist < 0.05, jnp.maximum(_bonus(placing_dist, max_placing), 0.0), 0.0)
    reward = reach_rew + place_rew
    return common.eval_out(
        reward=reward, success=(placing_dist <= 0.07).astype(jnp.float32),
        near_object=1.0, obj_to_target=placing_dist)


# --- tool tasks ------------------------------------------------------------

def v1_assembly(spec, state, obs, action):
    """ref sawyer_assembly_peg_v3.py:270-335 (v1). graspPos = wrench handle
    (obs), objPos = RoundNut body com = obs + (-0.13, 0, 0); xy placing
    distance + a final z-descent term once over the peg."""
    grasp = obs[4:7]
    nut = state.sim.obj_pos[0]     # RoundNut body com — exact in our engine
    fc = _tcp(state)
    obj_height = state.obj_init_pos[0, 2]
    height_target = obj_height + 0.1
    placing_dist = _norm(nut[:2] - state.target[:2])
    placing_final = jnp.abs(nut[2] - obj_height)
    reach_dist = _norm(grasp - fc)
    reach_xy = _norm(grasp[:2] - fc[:2])
    z_rew = jnp.abs(fc[2] - state.init_tcp[2])
    reach_rew = jnp.where(reach_xy < 0.04, -reach_dist, -reach_xy - z_rew)
    reach_rew = jnp.where(reach_dist < 0.04,
                          -reach_dist + _grip_bonus(action), reach_rew)
    pick_done = (nut[2] >= height_target - 0.01) & (reach_dist < 0.03)
    dropped = (nut[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    place_completed = (jnp.abs(nut[0] - state.target[0]) < 0.03) & \
                      (jnp.abs(nut[1] - state.target[1]) < 0.03)
    pick_rew = jnp.where(
        place_completed | (pick_done & ~dropped), H_SCALE * height_target,
        jnp.where((reach_dist < 0.04) & (nut[2] > obj_height + 0.005),
                  H_SCALE * jnp.minimum(height_target, nut[2]), 0.0))
    nut_init = state.obj_init_pos[0]   # stored as the nut COM already
    max_placing = _norm(
        jnp.array([nut_init[0], nut_init[1], height_target]) - state.target
    ) + height_target
    place_rew = _bonus(placing_dist, max_placing)
    place_rew = place_rew + jnp.where(
        place_completed,
        2000.0 * (height_target - placing_final)
        + 2000.0 * (jnp.exp(-(placing_final**2) / 0.003)
                    + jnp.exp(-(placing_final**2) / 0.0003)),
        0.0)
    place_rew = jnp.maximum(place_rew, 0.0)
    cond = place_completed | (pick_done & (reach_dist < 0.04) & ~dropped)
    place_rew = jnp.where(cond, place_rew, 0.0)
    reward = reach_rew + pick_rew + place_rew
    success = place_completed & (placing_final <= 0.04)
    return common.eval_out(reward=reward, success=success.astype(jnp.float32))


def v1_disassemble(spec, state, obs, action):
    """ref sawyer_disassemble_peg_v3.py:230-305 (v1). objPos = graspPos =
    obs; once the nut com clears the peg in xy, reach is zeroed and pickRew
    is pinned to heightTarget*100."""
    obj = obs[4:7]
    nut = state.sim.obj_pos[0]     # RoundNut body com — exact in our engine
    fc = _tcp(state)
    obj_height = state.obj_init_pos[0, 2]
    height_target = obj_height + 0.05
    placing_dist = _norm(obj - state.target)
    reach_dist = _norm(obj - fc)
    reach_xy = _norm(obj[:2] - fc[:2])
    z_dist = jnp.abs(fc[2] - state.init_tcp[2])
    reach_rew = jnp.where(reach_xy < 0.04, -reach_dist, -reach_xy - 2.0 * z_dist)
    reach_rew = jnp.where(reach_dist < 0.04,
                          -reach_dist + _grip_bonus(action), reach_rew)
    pick_done = (obj[2] >= height_target - 0.01) & (reach_dist < 0.04)
    dropped = (obj[2] < obj_height + 0.005) & (placing_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = jnp.where(
        pick_done & ~dropped, H_SCALE * height_target,
        jnp.where((reach_dist < 0.04) & (obj[2] > obj_height + 0.005),
                  H_SCALE * jnp.minimum(height_target, obj[2]), 0.0))
    nut_init = state.obj_init_pos[0]   # stored as the nut COM already
    max_placing = _norm(
        jnp.array([nut_init[0], nut_init[1], height_target]) - state.target
    ) + height_target
    place_rew = jnp.maximum(_bonus(placing_dist, max_placing), 0.0)
    cond = pick_done & (reach_dist < 0.03) & ~dropped
    place_rew = jnp.where(cond, place_rew, 0.0)
    # peg body sits at the nut's initial xy (the nut starts threaded on it)
    cleared = (jnp.abs(nut[0] - nut_init[0]) > 0.05) | \
              (jnp.abs(nut[1] - nut_init[1]) > 0.05)
    reach_rew = jnp.where(cleared, 0.0, reach_rew)
    pick_rew = jnp.where(cleared, height_target * 100.0, pick_rew)
    reward = reach_rew + pick_rew + place_rew
    return common.eval_out(
        reward=reward,
        success=(obs[6] > state.target[2]).astype(jnp.float32))


def v1_hammer(spec, state, obs, action):
    """ref sawyer_hammer_v3.py:232-280 (v1). objPos = nailHead site (our
    obs[11:14] IS the nail head); hammerHead = the HammerHead geom at local
    (0.16, 0, 0) rotated by the live hammer body quat obs[7:11] (wxyz) —
    bit-exact against the reference trace's recorded geom xpos."""
    hammer = obs[4:7]
    hammer_head = hammer + maths.quat_rotate(obs[7:11], jnp.array([0.16, 0.0, 0.0]))
    nail = obs[11:14]
    fc = _tcp(state)
    hammer_height = state.obj_init_pos[0, 2]
    height_target = hammer_height + 0.09
    hammer_dist = _norm(nail - hammer_head)
    screw_dist = jnp.abs(nail[1] - state.target[1])
    reach_dist = _norm(hammer - fc)
    reach_rew = jnp.where(reach_dist < 0.05,
                          -reach_dist + _grip_bonus(action), -reach_dist)
    pick_done = hammer[2] >= height_target - 0.01
    dropped = (hammer[2] < hammer_height + 0.005) & (hammer_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = _pick_rew(hammer[2], height_target, hammer_height, reach_dist,
                         dropped, pick_done)
    # maxHammerDist (ref :125-139): the reference subtracts obj_init_pos
    # (the HAMMER's own init, not the nail), so the norm collapses to the
    # pure lift height: (heightTarget - hammer_z0) + heightTarget
    # + |hammer_y0 - target_y|
    max_hammer = (
        (height_target - state.obj_init_pos[0, 2]) + height_target
        + jnp.abs(state.obj_init_pos[0, 1] - state.target[1])
    )
    d = hammer_dist + screw_dist
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    hammer_rew = jnp.where(
        cond,
        jnp.maximum(
            1000.0 * (max_hammer - hammer_dist - screw_dist)
            + C1 * (jnp.exp(-(d**2) / C2) + jnp.exp(-(d**2) / C3)), 0.0),
        0.0)
    reward = reach_rew + pick_rew + hammer_rew
    return common.eval_out(
        reward=reward,
        success=(state.sim.joint_q[0] > 0.09).astype(jnp.float32))


def _v1_stick(obs, action, state, *, second_bonus_c=(C2, C3),
              pull_target_xy=False):
    """Shared stick-push/stick-pull v1 body (ref sawyer_stick_push_v3.py:
    350-410). `objPos = obs[6:9]` — the reference reads a stale v2-era obs
    slice that straddles stick z and quat; preserved verbatim."""
    stick = obs[4:7]
    objp = obs[6:9]
    fc = _tcp(state)
    stick_init = state.extras[:3]
    stick_height = stick_init[2]
    height_target = stick_height + 0.04
    push_dist = _norm(objp[:2] - state.target[:2])
    place_dist = _norm(objp - stick)
    reach_dist = _norm(stick - fc)
    reach_rew = jnp.where(reach_dist < 0.05,
                          -reach_dist + _grip_bonus(action), -reach_dist)
    pick_done = stick[2] >= height_target - 0.01
    dropped = (stick[2] < stick_height + 0.005) & (push_dist > 0.02) & (reach_dist > 0.02)
    pick_rew = _pick_rew(stick[2], height_target, stick_height, reach_dist,
                         dropped, pick_done)
    cont_init = state.obj_init_pos[0]   # the fixed container origin
    max_place = _norm(
        jnp.array([cont_init[0], cont_init[1], height_target])
        - stick_init) + height_target
    max_push = _norm(cont_init[:2] - state.target[:2])
    c5, c6 = second_bonus_c
    second = 1000.0 * (max_push - push_dist) + 2000.0 * (
        jnp.exp(-(push_dist**2) / c5) + jnp.exp(-(push_dist**2) / c6))
    push_rew = _bonus(place_dist, max_place) + jnp.where(place_dist < 0.05, second, 0.0)
    cond = pick_done & (reach_dist < 0.1) & ~dropped
    push_rew = jnp.where(cond, jnp.maximum(push_rew, 0.0), 0.0)
    reward = reach_rew + pick_rew + push_rew
    return reward, push_dist


def v1_stick_push(spec, state, obs, action):
    """v1 stick-push; info success is `grasp_success and success` with the
    tuple's grasp slot zeroed — always 0.0 (reference quirk)."""
    reward, push_dist = _v1_stick(obs, action, state,
                                  second_bonus_c=(0.001, 0.0001))
    return common.eval_out(
        reward=reward, success=0.0, near_object=1.0, obj_to_target=push_dist)


def v1_stick_pull(spec, state, obs, action):
    """v1 stick-pull; success computed from the live obs (handle in the
    target zone AND the stick inserted), same as v2."""
    from metaworld_tpu.envs.tasks.stick_pull_v3 import _inserted

    reward, pull_dist = _v1_stick(obs, action, state)
    handle = obs[11:14]
    end_of_stick = obs[4:7] + jnp.array([0.13, 0.0, 0.0])
    success = (_norm(handle - state.target) <= 0.12) & _inserted(end_of_stick, handle)
    return common.eval_out(
        reward=reward, success=success.astype(jnp.float32),
        near_object=1.0, obj_to_target=pull_dist)


V1_REWARDS = {
    "assembly-v3": v1_assembly,
    "basketball-v3": v1_basketball,
    "bin-picking-v3": v1_bin_picking,
    "box-close-v3": v1_box_close,
    "button-press-topdown-v3": v1_button_press_topdown,
    "button-press-topdown-wall-v3": v1_button_press_topdown_wall,
    "button-press-v3": v1_button_press,
    "button-press-wall-v3": v1_button_press_wall,
    "coffee-button-v3": v1_coffee_button,
    "coffee-pull-v3": v1_coffee_pull,
    "coffee-push-v3": v1_coffee_push,
    "dial-turn-v3": v1_dial_turn,
    "disassemble-v3": v1_disassemble,
    "door-close-v3": v1_door_close,
    "door-lock-v3": v1_door_lock,
    "door-open-v3": v1_door_open,
    "door-unlock-v3": v1_door_unlock,
    "hand-insert-v3": v1_hand_insert,
    "drawer-close-v3": v1_drawer_close,
    "drawer-open-v3": v1_drawer_open,
    "faucet-open-v3": v1_faucet_open,
    "faucet-close-v3": v1_faucet_close,
    "hammer-v3": v1_hammer,
    "handle-press-side-v3": v1_handle_press_side,
    "handle-press-v3": v1_handle_press,
    "handle-pull-side-v3": v1_handle_pull_side,
    "handle-pull-v3": v1_handle_pull,
    "lever-pull-v3": v1_lever_pull,
    "pick-place-wall-v3": v1_pick_place_wall,
    "pick-out-of-hole-v3": v1_pick_out_of_hole,
    "pick-place-v3": v1_pick_place,
    "plate-slide-v3": v1_plate_slide,
    "plate-slide-side-v3": v1_plate_slide,
    "plate-slide-back-v3": v1_plate_slide,
    "plate-slide-back-side-v3": v1_plate_slide_back_side,
    "peg-insert-side-v3": v1_peg_insert_side,
    "peg-unplug-side-v3": v1_peg_unplug_side,
    "soccer-v3": v1_soccer,
    "stick-push-v3": v1_stick_push,
    "stick-pull-v3": v1_stick_pull,
    "push-v3": v1_push,
    "push-wall-v3": v1_push_wall,
    "push-back-v3": v1_push_back,
    "reach-v3": v1_reach,
    "reach-wall-v3": v1_reach_wall,
    "shelf-place-v3": v1_shelf_place,
    "sweep-into-v3": v1_sweep_into,
    "sweep-v3": v1_sweep,
    "window-open-v3": v1_window_open,
    "window-close-v3": v1_window_close,
}
