"""Sawyer env core: task specs, observation assembly, step and reset.

Functional equivalent of the reference's SawyerXYZEnv stepping core
(ref metaworld/sawyer_xyz_env.py:143-858): 4-dof action -> mocap delta +
symmetric gripper ctrl, 39-dim frame-stacked observation, obs clipping,
per-task reward dispatch, truncation at 500 steps. Everything is a pure
function of (TaskSpec, EnvState, action); TaskSpec is static per task so each
task's step jits into a single fused XLA program and MT batches unroll per
task group (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu.physics import engine, maths
from metaworld_tpu.types import (
    HAND_SPACE_HIGH,
    HAND_SPACE_LOW,
    MAX_JOINT,
    MAX_OBJ,
    MAX_PATH_LENGTH,
    N_EXTRAS,
    EnvState,
    SceneParams,
    SimState,
    StepOut,)
from metaworld_tpu.rewards import utils as reward_utils


@dataclasses.dataclass(frozen=True)
class EvalOut:
    """Reward + metrics emitted by a task's evaluate_state
    (ref sawyer_xyz_env.py:644-656 contract)."""

    reward: jnp.ndarray
    success: jnp.ndarray
    near_object: jnp.ndarray
    grasp_success: jnp.ndarray
    grasp_reward: jnp.ndarray
    in_place_reward: jnp.ndarray
    obj_to_target: jnp.ndarray
    unscaled_reward: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    """Static description of one of the 50 tasks (python-level; never traced)."""

    name: str
    task_id: int
    scene: SceneParams                       # unbatched numpy row
    rand_low: np.ndarray                     # (d,) random reset space
    rand_high: np.ndarray
    hand_init_pos: np.ndarray                # (3,)
    goal_low: np.ndarray                     # (3,) goal_space bounds
    goal_high: np.ndarray
    # reset_fn(spec, rand_vec(d,), rng) -> dict of EnvState field overrides
    reset_fn: Callable = None
    # reward_fn(spec, state, obs, action) -> EvalOut
    reward_fn: Callable = None
    # obs_fn(spec, state) -> (obj_pos (MAX_OBJ,3), obj_quat (MAX_OBJ,4))
    obs_fn: Callable = None
    n_obs_obj: int = 1                       # how many object slots are real
    # --- observation quats (ref _get_quat_objects per env) ---
    # absolute body orientation at reset, wxyz (MAX_OBJ, 4); None = identity
    obj_quat0: np.ndarray = None
    # per-slot emission convention: "xyzw" (scipy Rotation envs, e.g.
    # sawyer_reach_v3.py:104-105), "wxyz" (mujoco body xquat envs, e.g.
    # sawyer_hammer_v3.py:96-99), "zeros" (e.g. sawyer_drawer_close_v3.py)
    quat_style: tuple = ("xyzw", "xyzw")
    # fixture-driven orientation: compose R(joint_axis[j], joint_q[j]) for
    # slot i when quat_joint[i] = j >= 0 (doors/lever, whose reported body
    # rotates with the hinge)
    quat_joint: tuple = (-1, -1)
    # reported-position offset from the physics COM, per object slot: the
    # reference reports the body FRAME origin (get_body_com returns
    # data.body(name).xpos), which for bodies whose geoms are offset inside
    # the body (block.xml: geom at +0.02) sits BELOW the COM the engine
    # integrates. reported = COM + obj_report_off (e.g. sweep's block:
    # (0,0,-0.02); rewards read the reported value, like the reference's).
    obj_report_off: np.ndarray = None

    @property
    def rand_dim(self) -> int:
        return int(self.rand_low.shape[0])

    # NB these caches hold NUMPY leaves, not device arrays: a device
    # constant materialized inside a shard_map trace carries that trace's
    # mesh on its aval, and the cache would then leak a mesh-1 constant
    # into a later mesh-8 trace ("context mesh should match aval mesh"
    # when scaling_bench sweeps mesh sizes in one process). Numpy trees
    # are mesh-agnostic and lift into each trace as fresh constants.
    @functools.cached_property
    def scene_device(self) -> SceneParams:
        return jax.tree.map(np.asarray, self.scene)

    @functools.cached_property
    def obs_clip_visible(self):
        lo, hi = obs_bounds(self, True)
        return np.asarray(lo), np.asarray(hi)

    @functools.cached_property
    def obs_clip_hidden(self):
        lo, hi = obs_bounds(self, False)
        return np.asarray(lo), np.asarray(hi)

    @functools.cached_property
    def quat0_device(self):
        if self.obj_quat0 is None:
            # identity wxyz in raw numpy — maths.quat_identity() is a jnp
            # op and would trace if first touched inside a jit/shard_map
            return np.tile(np.array([1.0, 0.0, 0.0, 0.0], np.float32),
                           (MAX_OBJ, 1))
        return np.asarray(self.obj_quat0)


# ---------------------------------------------------------------------------
# observation assembly (ref sawyer_xyz_env.py:475-527)
# ---------------------------------------------------------------------------


def live_obj_quat(spec: TaskSpec, state: EnvState) -> jnp.ndarray:
    """(MAX_OBJ, 4) object quaternions as the reference reports them
    (ref _get_curr_obs_combined_no_goal, sawyer_xyz_env.py:475-511): the
    live absolute orientation — engine delta rotation (plus the fixture
    hinge rotation for joint-mounted bodies) composed onto the task's reset
    orientation — emitted in the per-env convention (mujoco body xquat =
    wxyz, scipy Rotation.as_quat = xyzw, or zeros)."""
    scene = spec.scene_device
    rows = []
    for i in range(MAX_OBJ):
        style = spec.quat_style[i] if i < len(spec.quat_style) else "xyzw"
        if style == "zeros":
            rows.append(jnp.zeros(4))
            continue
        qd = state.sim.obj_quat[i]
        j = spec.quat_joint[i] if i < len(spec.quat_joint) else -1
        if j >= 0:
            qj = maths.axis_angle_quat(scene.joint_axis[j],
                                       state.sim.joint_q[j])
            qd = maths.quat_mul(qj, qd)
        q_abs = maths.quat_mul(qd, spec.quat0_device[i])
        rows.append(maths.quat_to_xyzw(q_abs) if style == "xyzw" else q_abs)
    return jnp.stack(rows)


def default_obs_fn(spec: TaskSpec, state: EnvState):
    """Objects report their body-frame position (COM + per-task report
    offset, see TaskSpec.obj_report_off) and live orientation."""
    pos = state.sim.obj_pos
    if spec.obj_report_off is not None:
        pos = pos + np.asarray(spec.obj_report_off, np.float32)
    return pos, live_obj_quat(spec, state)


def curr_obs18(spec: TaskSpec, state: EnvState) -> jnp.ndarray:
    """[hand(3), gripper(1), obj block padded to 14] (ref :475-511)."""
    hand = engine.obs_hand_pos(state.sim)
    grip = engine.aperture_obs(state.sim)
    obs_fn = spec.obs_fn or default_obs_fn
    obj_pos, obj_quat = obs_fn(spec, state)
    blocks = []
    for i in range(spec.n_obs_obj):
        blocks.append(obj_pos[i])
        blocks.append(obj_quat[i])
    pad = 14 - 7 * spec.n_obs_obj
    if pad:
        blocks.append(jnp.zeros(pad))
    return jnp.concatenate([hand, grip[None]] + blocks)


def assemble_obs(spec: TaskSpec, state: EnvState, curr: jnp.ndarray) -> jnp.ndarray:
    """[curr18 | prev18 | goal3], goal zeroed when hidden (ref :513-527)."""
    goal = state.target * state_goal_visible(state)
    return jnp.concatenate([curr, state.prev_obs, goal])


def state_goal_visible(state: EnvState) -> jnp.ndarray:
    return state.goal_visible


def obs_bounds(spec: TaskSpec, goal_visible: bool):
    """Observation-space clip bounds (ref sawyer_observation_space :537-577)."""
    lo_hand = np.asarray(HAND_SPACE_LOW)
    hi_hand = np.asarray(HAND_SPACE_HIGH)
    obj_lo = np.full(14, -np.inf)
    obj_hi = np.full(14, np.inf)
    g_lo = spec.goal_low if goal_visible else np.zeros(3)
    g_hi = spec.goal_high if goal_visible else np.zeros(3)
    low = np.concatenate([lo_hand, [-1.0], obj_lo, lo_hand, [-1.0], obj_lo, g_lo])
    high = np.concatenate([hi_hand, [1.0], obj_hi, hi_hand, [1.0], obj_hi, g_hi])
    return low, high


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------


def env_step(spec: TaskSpec, state: EnvState, action: jnp.ndarray):
    """One control step (ref sawyer_xyz_env.py:579-642). Returns
    (new_state, StepOut). Never terminates; truncates at 500 steps.

    Sim-instability guard (ref _did_see_sim_exception, sawyer_xyz_env.py:
    235,250,603-619): if the physics update produced any non-finite state,
    the step keeps the LAST STABLE sim state and reports reward 0 — the
    in-graph equivalent of the reference catching a MuJoCo exception and
    returning its last stable observation.

    Physics backend: the readable per-env engine (physics/engine.py). The
    lane-oriented / Pallas fast paths (engine_lanes, pallas_step) serve the
    fused batched consumers and are pinned to this engine by
    tests/test_engine_lanes.py; the per-env path stays on engine.py because
    reverse-mode AD through it compiles in seconds (the lane layout's
    scalar-graph transpose takes XLA:CPU >15 min to compile, which is what
    the differentiability suite, train_apg.py and any user jax.grad hit)."""
    sim = engine.control_step(spec.scene_device, state.sim, action)
    stable = (jnp.isfinite(sim.hand).all()
              & jnp.isfinite(sim.obj_pos).all()
              & jnp.isfinite(sim.joint_q).all()
              & jnp.isfinite(sim.gripper).all())
    sim = jax.tree.map(
        lambda new, old: jnp.where(stable, new, old), sim, state.sim)
    path_length = state.path_length + 1
    state = state.replace(sim=sim, path_length=path_length)
    state, out = post_step(spec, state, action)
    out = out.replace(
        reward=jnp.where(stable, out.reward, 0.0),
        unscaled_reward=jnp.where(stable, out.unscaled_reward, 0.0),
    )
    return state, out


def post_step(spec: TaskSpec, state: EnvState, action: jnp.ndarray):
    """Observation assembly + reward after the physics step — the per-task
    half of env_step, so a fused multi-task batch can run one shared physics
    call and lax.switch only this part."""
    curr = curr_obs18(spec, state)
    obs = assemble_obs(spec, state, curr)
    lo_v, hi_v = spec.obs_clip_visible
    lo_h, hi_h = spec.obs_clip_hidden
    lo = jnp.where(state.goal_visible > 0, lo_v, lo_h)
    hi = jnp.where(state.goal_visible > 0, hi_v, hi_h)
    obs = jnp.clip(obs, lo, hi)
    state = state.replace(prev_obs=curr)

    out = spec.reward_fn(spec, state, obs, action)
    truncated = state.path_length >= MAX_PATH_LENGTH
    step = StepOut(
        obs=obs,
        reward=out.reward,
        terminated=jnp.zeros((), dtype=bool),
        truncated=truncated,
        success=out.success,
        near_object=out.near_object,
        grasp_success=out.grasp_success,
        grasp_reward=out.grasp_reward,
        in_place_reward=out.in_place_reward,
        obj_to_target=out.obj_to_target,
        unscaled_reward=out.unscaled_reward,
    )
    return state, step


# ---------------------------------------------------------------------------
# reset
# ---------------------------------------------------------------------------


def base_sim_state(spec: TaskSpec) -> SimState:
    """Settled post-reset sim state: hand servoed to hand_init for 50 steps
    (ref _reset_hand :684-695, computed analytically), gripper fully open."""
    scene = spec.scene_device
    hand_init = jnp.asarray(spec.hand_init_pos)
    mocap, tcp = engine.settled_hand_state(scene, hand_init)
    pad_l0, pad_r0 = engine.pad_kinematics(tcp, jnp.ones(()))
    z = jnp.zeros
    return SimState(
        mocap=mocap,
        hand=tcp,
        hand_vel=z(3),
        gripper=jnp.ones(()),
        gripper_vel=z(()),
        obj_pos=z((MAX_OBJ, 3)),
        obj_quat=jnp.tile(maths.quat_identity(), (MAX_OBJ, 1)),
        obj_vel=z((MAX_OBJ, 3)),
        obj_angvel=z((MAX_OBJ, 3)),
        joint_q=z(MAX_JOINT),
        joint_v=z(MAX_JOINT),
        attached=z(MAX_OBJ),
        attach_off=z((MAX_OBJ, 3)),
        unanchored=z(MAX_OBJ),
        hooked=z(MAX_JOINT),
        hook_off=z(MAX_JOINT),
        hook_hoff=z((MAX_JOINT, 3)),
        pad_force_l=z(()),
        pad_force_r=z(()),
        pad_l=pad_l0,
        pad_r=pad_r0,
        fixture_pos=z(3),
    )


def env_reset(spec: TaskSpec, rand_vec: jnp.ndarray, rng: jnp.ndarray,
              goal_visible) -> tuple[EnvState, jnp.ndarray]:
    """Full reset (ref reset :664-682 + per-task reset_model). `rand_vec` is
    the task vector (padded to MAX_RAND); reset_fn consumes the first
    rand_dim entries. Returns (state, obs)."""
    sim = base_sim_state(spec)
    state = EnvState(
        sim=sim,
        prev_obs=jnp.zeros(18),
        target=jnp.zeros(3),
        hand_init=jnp.asarray(spec.hand_init_pos),
        init_tcp=sim.hand,
        init_left_pad=sim.hand + jnp.array([0.0, 0.047, engine.PAD_Z_OFFSET]),
        init_right_pad=sim.hand + jnp.array([0.0, -0.047, engine.PAD_Z_OFFSET]),
        obj_init_pos=jnp.zeros((MAX_OBJ, 3)),
        extras=jnp.zeros(N_EXTRAS),
        rand_vec=jnp.asarray(rand_vec),
        path_length=jnp.zeros((), dtype=jnp.int32),
        rng=rng,
        task_id=jnp.asarray(spec.task_id, dtype=jnp.int32),
        goal_visible=jnp.asarray(goal_visible, dtype=jnp.float32),
    )
    overrides = spec.reset_fn(spec, rand_vec[: spec.rand_dim], rng)
    sim_over = {k: v for k, v in overrides.items() if hasattr(sim, k)}
    st_over = {k: v for k, v in overrides.items() if hasattr(state, k) and not hasattr(sim, k)}
    state = state.replace(sim=sim.replace(**sim_over), **st_over)

    curr = curr_obs18(spec, state)
    state = state.replace(prev_obs=curr)
    # NB the reference does NOT clip the reset observation (clipping happens
    # only in step, ref sawyer_xyz_env.py:623-628 vs :664-682)
    obs = assemble_obs(spec, state, curr)
    return state, obs


# ---------------------------------------------------------------------------
# shared reward helpers
# ---------------------------------------------------------------------------


def gripper_caging_reward(
    spec: TaskSpec,
    state: EnvState,
    action,
    obj_pos,
    obj_radius: float,
    pad_success_thresh: float,
    object_reach_radius: float,
    xz_thresh: float,
    desired_gripper_effort: float = 1.0,
    high_density: bool = False,
    medium_density: bool = False,
):
    """The shared grasp-caging reward (ref sawyer_xyz_env.py:721-858).

    Note: the reference reads `leftpad`/`rightpad` body COMs live each step
    and its margins reference *current* pad positions (:761-769,801), which
    this reproduces via the engine's pad kinematics."""
    left_pad, right_pad = engine.pad_positions(state.sim)
    pad_y_lr = jnp.stack([left_pad[1], right_pad[1]])
    pad_to_obj_lr = jnp.abs(pad_y_lr - obj_pos[1])
    pad_to_objinit_lr = jnp.abs(pad_y_lr - state.obj_init_pos[0, 1])

    caging_lr_margin = jnp.abs(pad_to_objinit_lr - pad_success_thresh)
    caging_lr = [
        reward_utils.tolerance(
            pad_to_obj_lr[i],
            bounds=(obj_radius, pad_success_thresh),
            margin=caging_lr_margin[i],
            sigmoid="long_tail",
        )
        for i in range(2)
    ]
    caging_y = reward_utils.hamacher_product(caging_lr[0], caging_lr[1])

    tcp = state.sim.hand
    xz = jnp.array([0, 2])
    caging_xz_margin = jnp.linalg.norm(state.obj_init_pos[0, xz] - state.init_tcp[xz])
    caging_xz_margin = caging_xz_margin - xz_thresh
    caging_xz = reward_utils.tolerance(
        jnp.linalg.norm(tcp[xz] - obj_pos[xz]),
        bounds=(0, xz_thresh),
        margin=caging_xz_margin,
        sigmoid="long_tail",
    )

    gripper_closed = (
        jnp.minimum(jnp.maximum(0.0, action[-1]), desired_gripper_effort)
        / desired_gripper_effort
    )
    caging = reward_utils.hamacher_product(caging_y, caging_xz)
    gripping = jnp.where(caging > 0.97, gripper_closed, 0.0)
    caging_and_gripping = reward_utils.hamacher_product(caging, gripping)

    if high_density:
        caging_and_gripping = (caging_and_gripping + caging) / 2
    if medium_density:
        tcp_to_obj = jnp.linalg.norm(obj_pos - tcp)
        tcp_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.init_tcp)
        reach_margin = jnp.abs(tcp_to_obj_init - object_reach_radius)
        reach = reward_utils.tolerance(
            tcp_to_obj,
            bounds=(0, object_reach_radius),
            margin=reach_margin,
            sigmoid="long_tail",
        )
        caging_and_gripping = (caging_and_gripping + reach) / 2

    return caging_and_gripping


def gripper_caging_reward_grip(
    spec: TaskSpec,
    state: EnvState,
    action,
    obj_pos,
    obj_radius: float,
    grip_margin_add: float,
    xz_margin: float,
    caging_thresh: float = 0.95,
):
    """The caging variant shared by push-back/sweep/sweep-into/soccer
    (e.g. ref sawyer_sweep_v3.py:150-250): adds a tighter y_gripping band
    (bounds (obj_radius, obj_radius + grip_margin_add)) and AVERAGES caging
    with gripping instead of taking the hamacher product. Margins reference
    the live pad positions (the reference's init pads are mjData views)."""
    pad_success_margin = 0.05
    grip_success_margin = obj_radius + grip_margin_add
    tcp = state.sim.hand
    left_pad, right_pad = engine.pad_positions(state.sim)
    delta_y_left = left_pad[1] - obj_pos[1]
    delta_y_right = obj_pos[1] - right_pad[1]
    right_margin = jnp.abs(jnp.abs(obj_pos[1] - right_pad[1]) - pad_success_margin)
    left_margin = jnp.abs(jnp.abs(obj_pos[1] - left_pad[1]) - pad_success_margin)

    def tol(x, hi, margin):
        return reward_utils.tolerance(
            x, bounds=(obj_radius, hi), margin=margin, sigmoid="long_tail"
        )

    right_caging = tol(delta_y_right, pad_success_margin, right_margin)
    left_caging = tol(delta_y_left, pad_success_margin, left_margin)
    right_gripping = tol(delta_y_right, grip_success_margin, right_margin)
    left_gripping = tol(delta_y_left, grip_success_margin, left_margin)
    y_caging = reward_utils.hamacher_product(right_caging, left_caging)
    y_gripping = reward_utils.hamacher_product(right_gripping, left_gripping)

    tcp_xz = jnp.array([tcp[0], 0.0, tcp[2]])
    obj_xz = jnp.array([obj_pos[0], 0.0, obj_pos[2]])
    tcp_obj_xz = jnp.linalg.norm(tcp_xz - obj_xz)
    init_obj = state.obj_init_pos[0]
    init_obj_xz = jnp.array([init_obj[0], 0.0, init_obj[2]])
    init_tcp_xz = jnp.array([state.init_tcp[0], 0.0, state.init_tcp[2]])
    xz_margin_v = jnp.linalg.norm(init_obj_xz - init_tcp_xz) - xz_margin
    x_z_caging = reward_utils.tolerance(
        tcp_obj_xz, bounds=(0, xz_margin), margin=xz_margin_v, sigmoid="long_tail"
    )
    caging = reward_utils.hamacher_product(y_caging, x_z_caging)
    gripping = jnp.where(caging > caging_thresh, y_gripping, 0.0)
    return (caging + gripping) / 2


def touching_main_object(state: EnvState) -> jnp.ndarray:
    """Both pads carry positive force on the object (ref :393-440)."""
    return (state.sim.pad_force_l > 0) & (state.sim.pad_force_r > 0)
