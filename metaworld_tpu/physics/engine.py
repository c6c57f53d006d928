"""Batched analytic physics core — the TPU replacement for MuJoCo's mj_step.

The reference steps a native-C Newton solver per env process
(ref sawyer_xyz_env.py:595 -> mujoco.mj_step x frame_skip). Here the entire
control step is one pure function `control_step(scene, sim, action)` —
jit/vmap-able, branchless, with all per-task variation expressed as
`SceneParams` data gathered by task id. Physics model:

  * Hand: the Sawyer arm is mocap-welded (ref xyz_base.xml equality weld,
    solref 0.02). The arm never appears in observations or rewards, so the
    hand is modeled kinematically: the tcp tracks `mocap + TCP_OFFSET` with a
    first-order lag calibrated against reference trajectories
    (tau ~= 0.082 s, steady-state offset (0, 0.003, -0.0495)).
  * Gripper: the two finger slides are integrated exactly from the MJCF spec
    (position actuators kp=400, damping 1000, armature 100, ranges r:[0,.04],
    l:[-.03,0]; ref sawyer_reach_v3.xml:23-26, xyz_base.xml:163,178), with a
    contact clamp against a grasped object's width.
  * Free objects: semi-implicit Euler + position-projection contacts
    (ground/pit support, static boxes, hand/pad spheres, object-object) with
    Coulomb-style friction. Projection is unconditionally stable at the 2.5 ms
    substep, so no iterative solver is needed on the hot path.
  * Grasping: when both pads cage the object with positive squeeze, the
    object is welded to the hand (attach), reproducing MuJoCo's friction-cone
    grip; pad normal forces are exposed for `touching_object` parity
    (ref sawyer_xyz_env.py:401-440).
  * Fixtures: 1-dof hinge/slide mechanisms (door, drawer, button, faucet,
    window, dial, handle) integrated as generalized coordinates with
    spring/damper/limits; driven by hand contact (press) or a hook constraint
    (grab-and-pull), matching the reference's contact-driven fixtures.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu.types import (
    ACTION_SCALE,
    FRAME_SKIP,
    GRIPPER_FULL_OPEN,
    SIM_DT,
    TABLE_Z,
    JointType,
    ObjType,
    SceneParams,
    SimState,
)
from metaworld_tpu.physics import maths

# --- calibrated hand-tracking constants (fit on reference reach-v3 traces) ---
TCP_OFFSET = jnp.array([0.0044, 0.0015, -0.0498])  # tcp rest offset from mocap (measured at the reference settle)
# Second-order weld tracking: ramp lag = 2*zeta/omega ~= 50 ms (gap-binned
# free-motion fit of all 50 golden traces gives an effective first-order
# constant of 0.042-0.048 s for 8-60 mm gaps; a naive whole-trace fit
# drifts to ~0.08 because contact-stuck phases contaminate it). The
# second-order form adds the arm's MOMENTUM: the tcp coasts a few cm past
# a reversing target (golden wall tasks clear wall edges on exactly that
# overshoot).
HAND_W = 40.0                                  # natural frequency (rad/s)
HAND_ZETA = 1.0                                # damping ratio
HAND_VMAX = 1.2                                # weld speed saturation (m/s):
# golden-trace tcp speeds top out at p99 = 14.6 mm per 12.5 ms control step
# obs hand position = body("hand").xpos sits above the tcp (fingertip sites)
HAND_BODY_OFFSET = jnp.array([0.0, 0.0, 0.045])
# pad box centers sit above the fingertip sites (pad long axis is vertical)
PAD_Z_OFFSET = 0.045
# claw gap = 0.1 - (q_r - q_l); pad gap = claw gap - 0.006 (pads inset 3mm each)
PAD_GAP_INSET = 0.006

# --- arm reach envelope (sampled from the reference model, see
# scripts/fit_reach_envelope.py) ---
# The mocap weld drags a 7-dof arm with joint limits: a weld target outside
# the arm's reachable set leaves the tcp parked on the envelope boundary
# nearest the target (golden push-back: mocap y=0.893 at z=0.05, tcp stalls
# at y~0.845 with right_j1 pinned at its -0.50 range stop). The sampled
# field maps mocap grid points -> settled tcp displacement; the engine
# trilerps it at the live mocap and shifts the weld target. Small interior
# values (sampling noise + the mean sag TCP_OFFSET already carries) are
# tapered to zero so interior tracking keeps its trace-fit calibration.
_REACH = np.load(
    os.path.join(os.path.dirname(__file__), "..", "data", "reach_envelope.npz")
)
_REACH_LO = _REACH["lo"].astype(np.float32)
_REACH_HI = _REACH["hi"].astype(np.float32)
_REACH_N = _REACH["n"].astype(np.int32)
_REACH_DELTA = _REACH["delta"].astype(np.float32)


def _reach_target_delta(p):
    """Trilinear sample of the settled-tcp displacement field at mocap p."""
    n = jnp.asarray(_REACH_N)
    t = (p - _REACH_LO) / (_REACH_HI - _REACH_LO) * (n - 1).astype(p.dtype)
    t = jnp.clip(t, 0.0, (n - 1).astype(p.dtype) - 1e-4)
    i0 = jnp.floor(t).astype(jnp.int32)
    f = t - i0
    grid = jnp.asarray(_REACH_DELTA)
    acc = jnp.zeros(3, p.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[0] if dx else 1.0 - f[0])
                    * (f[1] if dy else 1.0 - f[1])
                    * (f[2] if dz else 1.0 - f[2])
                )
                acc = acc + w * grid[i0[0] + dx, i0[1] + dy, i0[2] + dz]
    mag = _norm(acc)
    # taper: 0 below 8 mm, full above 20 mm
    gate = jnp.clip((mag - 0.008) / 0.012, 0.0, 1.0)
    return acc * gate


# gripper finger ODE constants from the MJCF (per finger):
#   q'' = (kp*(ctrl - q) - damping*q') / (armature + mass)
_F_KP = 400.0
_F_DAMP = 1000.0
_F_MASS = 100.0
_R_RANGE = (0.0, 0.04)
_L_RANGE = (-0.03, 0.0)

# contact / interaction constants
_HAND_SPHERE_R = 0.026   # palm/claw effective radius for pushing
_HAND_TIP_R = 0.005      # fingertip sphere vs static geometry
_HAND_KNUCKLE_R = 0.03   # knuckle block sphere vs static geometry
_PAD_TIP_BEVEL = 0.008   # fingertip taper: grazing edge landings within this
                         # horizontal overlap wedge off the vertical face
_WELD_K = 600.0          # effective weld+arm stiffness (N per m of tcp-target
                         # stretch) driving loaded fixtures — fit on the golden
                         # lever/faucet/dial stretch-vs-speed balance
_HOOK_SLIP = 0.13        # weld stretch perpendicular to the joint's motion at
                         # which the squeezed wrap slips off the handle
_FRICTION_DEFAULT = 0.55
_K_SLIDE_LIM = 400.0     # soft slide-limit spring (1/s^2, mass-normalized)
_D_SLIDE_LIM = 30.0      # extra damping outside a slide range (1/s)
_GRASP_XZ_TOL = 0.035    # max horizontal tcp-to-object distance for a grasp
_GRASP_Z_SPAN = 0.09     # pads (vertical plates) span tcp .. tcp+0.09 in z
_HOOK_RADIUS = 0.045     # tcp-to-handle distance to hook a hookable fixture
_GRAVITY = 9.81
_MU_HAND = 1.0           # finger-vs-fixture Coulomb coefficient (hand pinning)
_MU_TABLE = 1.5          # fingertip-vs-table Coulomb coefficient: calibrated
                         # on the golden lever-pull retreat (mocap parked
                         # 0.15 m below the surface, tcp creeps ~0.5 mm per
                         # control step against a 0.3 m lateral weld stretch)


def _norm(x, axis=None):
    """L2 norm with a NaN-free gradient at zero. `jnp.linalg.norm`'s VJP is
    x/||x||, which is 0/0 for the exactly-zero vectors that padded joint /
    object slots produce on every step — one such NaN in an unselected
    `where` branch poisons the whole backward pass (NaN * 0 = NaN), killing
    differentiation through the engine. Forward-identical above 1e-12 m."""
    ss = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(ss, 1e-24))


def gripper_gap(sim: SimState) -> jnp.ndarray:
    """Claw gap in meters from the normalized aperture."""
    return sim.gripper * GRIPPER_FULL_OPEN


def pad_kinematics(hand, gripper):
    """World positions of the left/right pad box centers from the hand pose.

    Pads open along y around the tcp (ref xyz_base.xml:159-183); the
    symmetric split is within ~1 mm of a global least-squares fit of the
    reference's recorded pad trajectories (left = +0.0464 - 0.0505*closed,
    right = -0.0477 + 0.0498*closed vs ours +/-(0.047 - 0.050*closed))."""
    gap = gripper * GRIPPER_FULL_OPEN - PAD_GAP_INSET
    half = gap / 2.0
    up = jnp.array([0.0, 0.0, PAD_Z_OFFSET])
    left = hand + up + jnp.array([0.0, 1.0, 0.0]) * half
    right = hand + up - jnp.array([0.0, 1.0, 0.0]) * half
    return left, right


def pad_positions(sim: SimState):
    """Left/right pad centers as carried in the sim state (written by the
    engine each substep; rewards and `touching_object` consumers read these,
    and trace-replay harnesses can inject the reference's recorded pads)."""
    return sim.pad_l, sim.pad_r


def obs_hand_pos(sim: SimState) -> jnp.ndarray:
    """Position reported as obs[0:3] (the "hand" body, ref sawyer_xyz_env.py:67-69)."""
    return sim.hand + HAND_BODY_OFFSET


def aperture_obs(sim: SimState) -> jnp.ndarray:
    """obs[3]: claw distance / 0.1, clipped (ref sawyer_xyz_env.py:497-498)."""
    return jnp.clip(sim.gripper, 0.0, 1.0)


def _support_z(scene: SceneParams, xy: jnp.ndarray) -> jnp.ndarray:
    """Ground support height under a point: table top (scene.table_z — the
    hole scenes' basic_scene_b tabletop sits at +0.05), or the pit floor
    when inside the table hole (sweep-into / hand-insert /
    pick-out-of-hole)."""
    base = TABLE_Z + scene.table_z
    in_hole = jnp.all(jnp.abs(xy - scene.hole_center) < scene.hole_halfsize)
    has_hole = jnp.any(scene.hole_halfsize > 0.0)
    return jnp.where(has_hole & in_hole, base - scene.pit_depth, base)


def _static_boxes_world(scene: SceneParams, fixture_pos: jnp.ndarray):
    pos = scene.static_pos + scene.static_rel[:, None] * fixture_pos[None, :]
    return pos, scene.static_size


def _sphere_box_pushout(p, r, box_pos, box_size):
    """Push a sphere (p, r) out of an AABB. Returns (correction, normal, pen)."""
    d = p - box_pos
    clamped = jnp.clip(d, -box_size, box_size)
    closest = box_pos + clamped
    delta = p - closest
    dist = _norm(delta)
    # outside-face case
    n_out = delta / jnp.maximum(dist, 1e-9)
    pen_out = jnp.maximum(r - dist, 0.0)
    # fully inside the box: push out along the axis of least penetration
    inside = dist < 1e-9
    depth = box_size - jnp.abs(d) + r
    axis = jnp.argmin(depth)
    hot = (jnp.arange(3) == axis).astype(d.dtype)
    d_axis = jnp.sum(hot * d)
    n_in = hot * (jnp.sign(d_axis) + (d_axis == 0.0))
    pen_in = jnp.sum(hot * depth)
    n = jnp.where(inside, n_in, n_out)
    pen = jnp.where(inside, pen_in, pen_out)
    return n * pen, n, pen


def _resolve_kinematic_contact(pos, vel, kin_pos, kin_vel, r_sum):
    """Sphere (pos, vel) vs kinematic sphere (hand parts). Position-project the
    free body out and match normal velocity. Returns (pos, vel, pen)."""
    delta = pos - kin_pos
    dist = _norm(delta)
    n = delta / jnp.maximum(dist, 1e-9)
    pen = jnp.maximum(r_sum - dist, 0.0)
    hit = pen > 0.0
    pos = pos + n * pen
    v_rel_n = jnp.dot(vel - kin_vel, n)
    vel = jnp.where(hit & (v_rel_n < 0.0), vel - n * v_rel_n + n * 0.0, vel)
    # impart pushing velocity
    push = jnp.dot(kin_vel, n)
    vel = jnp.where(hit & (push > jnp.dot(vel, n)), vel + n * (push - jnp.dot(vel, n)), vel)
    return pos, vel, pen


_SQUEEZE_CREEP = 0.055   # m/s the claw closes THROUGH a caged-but-unattached
                         # body (golden coffee-push: aperture 0.64 -> 0.30
                         # over ~50 control steps while the mug is squeezed
                         # out; a welded grasp clamps hard — golden
                         # coffee-pull holds 0.65 for the whole drag)


def _gripper_substep(sim: SimState, effort, clamp_gap, dt, hard):
    """Integrate the two finger slides one substep.

    ctrl = [effort, -effort] position targets (ref sawyer_xyz_env.py:595);
    `clamp_gap` is the minimum claw gap allowed by a caged object (inf when
    nothing is grasped); `hard` = the caged object is WELDED (clamp rigid)
    vs merely caged (clamp yields at _SQUEEZE_CREEP).
    Returns (gripper, gripper_vel, squeeze_force)."""
    gap = sim.gripper * GRIPPER_FULL_OPEN  # claw gap, open = 0.1
    # recover symmetric finger coordinates from the gap: q = (0.1 - gap)
    # split proportional to ranges (r moves up to .04, l up to .03)
    closed = (GRIPPER_FULL_OPEN - gap) / GRIPPER_FULL_OPEN  # 0 open .. 0.7max/0.1
    q_r = closed * 0.1 * (0.04 / 0.07)
    q_l = -closed * 0.1 * (0.03 / 0.07)
    v = sim.gripper_vel * GRIPPER_FULL_OPEN  # d(gap)/dt
    v_r = -v * (0.04 / 0.07)
    v_l = v * (0.03 / 0.07)

    e = jnp.clip(effort, -1.0, 1.0)
    acc_r = (_F_KP * (e - q_r) - _F_DAMP * v_r) / _F_MASS
    acc_l = (_F_KP * (-e - q_l) - _F_DAMP * v_l) / _F_MASS
    v_r = v_r + acc_r * dt
    v_l = v_l + acc_l * dt
    q_r_new = jnp.clip(q_r + v_r * dt, *_R_RANGE)
    q_l_new = jnp.clip(q_l + v_l * dt, *_L_RANGE)
    v_r = (q_r_new - q_r) / dt
    v_l = (q_l_new - q_l) / dt

    new_gap = GRIPPER_FULL_OPEN - (q_r_new - q_l_new)
    # contact clamp against a grasped object: fingers cannot close past it;
    # squeeze force = remaining actuator drive while the clamp binds. An
    # unattached cage yields: the claw squeezes through at _SQUEEZE_CREEP
    clamped_gap = jnp.maximum(new_gap, clamp_gap)
    binds = clamp_gap > new_gap
    # the creep floor is independent of the (bind-zeroed) finger ODE
    # velocity: while the actuator drives into an unwelded cage, the gap
    # shrinks at _SQUEEZE_CREEP down to the finger-range floor (0.03 m)
    soft_gap = jnp.maximum(
        jnp.minimum(clamped_gap, gap - _SQUEEZE_CREEP * dt),
        GRIPPER_FULL_OPEN - (_R_RANGE[1] - _L_RANGE[0]),
    )
    clamped_gap = jnp.where(hard | ~binds, clamped_gap, soft_gap)
    squeeze = jnp.where(binds, jnp.maximum(_F_KP * (e - q_r_new), 0.0), 0.0)
    # when the clamp binds the fingers are stopped by the object — zero the
    # aperture velocity so a transient clamp doesn't inject a spike
    new_vel = jnp.where(binds, 0.0, (clamped_gap - gap) / dt / GRIPPER_FULL_OPEN)
    return clamped_gap / GRIPPER_FULL_OPEN, new_vel, squeeze


def _grasp_geometry(scene: SceneParams, sim: SimState, obj_pos):
    """Per-object caging predicate: is the object's GRASP POINT (COM +
    obj_grasp_off — the wrench/hammer handle, lid knob) between the pads,
    within horizontal and vertical reach of the gripper?"""
    rel = (obj_pos + scene.obj_grasp_off) - sim.hand  # (MAX_OBJ, 3)
    dx = jnp.abs(rel[:, 0])
    dy = jnp.abs(rel[:, 1])
    dz = rel[:, 2]
    gap = gripper_gap(sim)
    between = dy < gap / 2.0 + 0.01
    near_x = dx < _GRASP_XZ_TOL
    near_z = (dz > -0.025) & (dz < _GRASP_Z_SPAN)
    return between & near_x & near_z


def control_step(scene: SceneParams, sim: SimState, action: jnp.ndarray) -> SimState:
    """One 12.5 ms control step: mocap update + FRAME_SKIP physics substeps
    (ref sawyer_xyz_env.py:579-642 step semantics)."""
    # --- mocap update (ref set_xyz_action, sawyer_xyz_env.py:320-336) ---
    a = jnp.clip(action[:3], -1.0, 1.0)
    mocap = jnp.clip(sim.mocap + a * ACTION_SCALE, scene.mocap_low, scene.mocap_high)
    effort = action[3]
    sim = sim.replace(mocap=mocap)

    def substep(sim: SimState, _):
        dt = SIM_DT
        # --- hand tracking (mocap weld) ---
        # SECOND-ORDER pull toward the mocap target, speed-capped. The weld
        # drags a massive arm: the tcp carries momentum, so it coasts a few
        # cm past a reversing target (the scripted wall tasks depend on
        # that overshoot to clear wall edges before descending — a
        # first-order lag cannot produce it). Ramp lag = 2*zeta/omega
        # (~50 ms, the golden free-tracking regime); the speed cap models
        # the weld's finite constraint force — golden tcp speeds top out
        # at ~1.2 m/s (p99 = 14.6 mm / control step), and without the cap
        # a large-gap chase tunnels through press faces.
        # weld target = mocap + rest offset, pulled onto the arm's reach
        # envelope (joint limits cap the far/low workspace — see
        # _reach_target_delta above)
        target = sim.mocap + TCP_OFFSET + _reach_target_delta(sim.mocap)
        vel_h = sim.hand_vel
        acc = HAND_W * HAND_W * (target - sim.hand) \
            - 2.0 * HAND_ZETA * HAND_W * vel_h
        vel_h = vel_h + acc * dt
        vn = _norm(vel_h)
        vel_h = vel_h * jnp.minimum(1.0, HAND_VMAX / jnp.maximum(vn, 1e-9))
        new_hand = sim.hand + vel_h * dt

        # --- hand vs static geometry ---
        # The reference's arm is a real collider: fixture bodies stop the
        # gripper even though the mocap target marches on (the weld
        # constraint yields). Model the claw as two spheres — fingertip at
        # the tcp, knuckle block above — pushed out of every
        # blocks_hand-flagged box each substep.
        box_pos_h, box_size_h = _static_boxes_world(scene, sim.fixture_pos)
        blk = scene.static_exists * scene.static_blocks_hand

        pad_half_blk = jnp.array([0.015, 0.0045, 0.045])

        def hand_clear(h):
            def one(bp, bs, on):
                corr, _, _ = _sphere_box_pushout(h, _HAND_TIP_R, bp, bs)
                return corr * on
            tip = jnp.sum(jax.vmap(one)(box_pos_h, box_size_h, blk), axis=0)
            h = h + tip

            def one_k(bp, bs, on):
                corr, _, _ = _sphere_box_pushout(
                    h + jnp.array([0.0, 0.0, 0.105]), _HAND_KNUCKLE_R, bp, bs)
                return corr * on
            knuckle = jnp.sum(jax.vmap(one_k)(box_pos_h, box_size_h, blk),
                              axis=0)
            h = h + knuckle

            # pad plates (AABB vs AABB): the finger boxes span z
            # [tcp, tcp+0.09] and are what actually lands on box lips and
            # faces (e.g. peg-insertion: the pads on the hole's upper lip
            # set the reference's insertion stop)
            lpad, rpad = pad_kinematics(h, sim.gripper)

            def one_p(pc, bp, bs, on):
                d = pc - bp
                pen = (pad_half_blk + bs) - jnp.abs(d)
                hit = jnp.all(pen > 0.0) & (on > 0)
                axis = jnp.argmin(pen)
                # Tapered fingertips (the reference's finger meshes narrow
                # toward the tip): a DESCENT that grazes a box's top edge
                # wedges off the vertical face instead of resting on the
                # lip (golden button-press-wall: the right finger slides
                # down the wall's +y face at ~2-6 mm overlap while the
                # recorded tcp descends past the wall top). Prefer the
                # horizontal resolution whenever the horizontal
                # penetration is within the tip bevel, even if the
                # first-touch top penetration is momentarily smaller.
                pen_h = jnp.minimum(pen[0], pen[1])
                axis_h = jnp.argmin(pen[:2])
                axis = jnp.where(pen_h < _PAD_TIP_BEVEL, axis_h, axis)
                hot = (jnp.arange(3) == axis).astype(d.dtype)
                d_axis = jnp.sum(hot * d)
                n = hot * jnp.where(d_axis >= 0, 1.0, -1.0)
                return jnp.where(hit, jnp.sum(hot * pen), 0.0) * n
            for pc in (lpad, rpad):
                corr_p = jnp.sum(
                    jax.vmap(one_p, in_axes=(None, 0, 0, 0))(
                        pc, box_pos_h, box_size_h, blk), axis=0)
                h = h + corr_p
            return h

        raw_hand = new_hand
        new_hand = hand_clear(new_hand)
        # Coulomb friction pins the pressed hand tangentially: when the
        # mocap target is buried in a blocks_hand box, the reference's weld
        # presses the fingers on the face with a force proportional to the
        # target penetration, and contact friction then holds the fingers
        # against lateral weld pull (golden button traces: the hand x stays
        # put while the recorded mocap drifts 5+ cm sideways). Both the
        # normal demand and the tangential demand scale with alpha, so the
        # cone test compares the per-substep blocked normal motion |corr|
        # against the attempted tangential motion.
        corr_h = new_hand - raw_hand
        cn_h = _norm(corr_h)
        n_h_dir = corr_h / jnp.maximum(cn_h, 1e-9)
        dv_h = new_hand - sim.hand
        dv_n_h = jnp.dot(dv_h, n_h_dir) * n_h_dir
        dv_t_h = dv_h - dv_n_h
        t_mag = _norm(dv_t_h)
        # stick/slip: friction absorbs tangential demand up to mu * the
        # blocked normal demand; only the excess slips (both demands scale
        # with the same weld gain, so the ratio test is gain-free)
        t_allow = jnp.maximum(t_mag - _MU_HAND * cn_h, 0.0)
        scale_t = jnp.where(
            cn_h > 1e-9, t_allow / jnp.maximum(t_mag, 1e-9), 1.0
        )
        new_hand = sim.hand + dv_n_h + dv_t_h * scale_t
        hand_vel = (new_hand - sim.hand) / dt

        # --- grasped-object gap clamp ---
        # width the claws would close onto if the object is caged
        caged = _grasp_geometry(scene, sim, sim.obj_pos)
        can_grasp = caged & (scene.obj_graspable > 0) & (scene.obj_exists > 0)
        # a caged-but-unwelded body SQUIRTS once the creeping claw closes
        # past ~half its width (golden coffee-push: the mug pops out along
        # the pad axis at aperture ~0.33 after 50 steps of squeeze-
        # through): drop its cage so the claw closes freely, and eject it
        squeezed_out = (
            can_grasp & (sim.attached == 0)
            & (gripper_gap(sim) < scene.obj_grasp_halfwidth)
            & (scene.obj_hook_grasp == 0)
        )
        can_grasp = can_grasp & ~squeezed_out
        obj_gap = jnp.where(
            can_grasp | (sim.attached > 0),
            2.0 * scene.obj_grasp_halfwidth + PAD_GAP_INSET,
            0.0,  # no caged object: fingers close freely
        )
        clamp_gap = jnp.max(obj_gap)
        hard_clamp = jnp.any(sim.attached > 0)
        gripper, gripper_vel, squeeze = _gripper_substep(
            sim, effort, clamp_gap, dt, hard_clamp)

        # --- attach / detach ---
        gap_m = gripper * GRIPPER_FULL_OPEN
        # hook-grasp objects (plug end caps) attach as soon as they are
        # caged with the grip driving closed — no squeeze contact needed
        gripping = (effort > 0.0) & (
            (squeeze > 0.0) | (scene.obj_hook_grasp > 0)
        )
        # a STABLE weld additionally needs the grasp point x-centered in
        # the claw (obj_grasp_x_tol): the tapered coffee mug wedges out
        # of an off-diameter pinch — it stays CAGED (gap clamp + pad
        # drag push it along) but never attaches, so the closing claw
        # eventually squeezes past and the mug pops free, exactly the
        # golden coffee-push sequence (drag north at hand speed, then
        # eject at aperture ~0.3). Blocks keep the loose 0.035 via their
        # default tol.
        tight_x = (
            jnp.abs((sim.obj_pos + scene.obj_grasp_off)[:, 0] - sim.hand[0])
            < scene.obj_grasp_x_tol
        )
        newly = can_grasp & tight_x & gripping & (sim.attached == 0)
        attach_off = jnp.where(
            newly[:, None], sim.obj_pos - new_hand[None, :], sim.attach_off
        )
        attached = jnp.where(newly, 1.0, sim.attached)
        # anchored objects (socketed plugs) come free at their first grasp
        unanchored = jnp.where(newly, 1.0, sim.unanchored)
        # release when the gripper opens or the object is commanded open;
        # a hooked plug cap stays caught regardless of the gap until the
        # grip opens
        release = (effort <= 0.0) | (
            (gap_m > 2.0 * scene.obj_grasp_halfwidth + PAD_GAP_INSET + 0.01)
            & (scene.obj_hook_grasp == 0)
        )
        attached = jnp.where(release, 0.0, attached)
        attached = attached * scene.obj_exists * scene.obj_graspable

        # while attached: the object settles INTO the grip — its GRASP POINT
        # (COM + obj_grasp_off) centers between the pads in xy and slides
        # toward the canonical grip height (grasp point -> tcp + 0.006).
        # Upward settling (squeeze raises a low grab) is fast and applies
        # to everything. Downward settling (gravity wedging a high grab
        # down between the fingers) applies to SPHERES only — a ball slips
        # to the finger waist (golden basketball carries ride ~12 mm above
        # the tcp, not at the capture offset), while a squeezed prism/rod
        # holds its grab height (lowering a carried peg shifts the
        # scripted policies' branch conditions and deadlocks their lift
        # phase).
        settle = 1.0 - jnp.exp(-dt / 0.05)
        sphere_dn = (scene.obj_type == ObjType.SPHERE).astype(jnp.float32)
        settle_dn = (1.0 - jnp.exp(-dt / 0.20)) * sphere_dn
        target_xy = -scene.obj_grasp_off[:, :2]
        off_xy = target_xy + (attach_off[:, :2] - target_xy) * (1.0 - settle)
        canon_z = 0.006 - scene.obj_grasp_off[:, 2]
        off_z = attach_off[:, 2]
        # upward settle only once the object is OFF its support: a squeeze
        # cannot levitate a resting block off the table — the golden
        # sweep-into claw cages the block low and sweeps it AT table
        # height (block z stays 0.07 until the hole swallows it); an
        # ungated settle hoisted it 40 mm mid-sweep
        sup_settle = jax.vmap(lambda p: _support_z(scene, p[:2]))(sim.obj_pos)
        resting_now = sim.obj_pos[:, 2] <= sup_settle + scene.obj_half_h + 1e-4
        settle_up = settle * (1.0 - resting_now)
        off_z = jnp.where(
            off_z < canon_z,
            off_z + (canon_z - off_z) * settle_up,
            off_z + (canon_z - off_z) * settle_dn,
        )
        settled = jnp.concatenate([off_xy, off_z[:, None]], axis=1)
        attach_off = jnp.where(attached[:, None] > 0, settled, attach_off)

        # --- free-object dynamics ---
        # anchored objects are pinned (socketed) until their first grasp
        pinned_anchor = (scene.obj_anchored > 0) & (unanchored == 0)
        # planar bodies (plate-slide puck, stick thermos) are 2-dof
        # slide-jointed in the reference model — they cannot leave their
        # plane and feel viscous joint damping instead of gravity/Coulomb
        # friction (ref sawyer_plate_slide.xml goal_slidex/goal_slidey,
        # sawyer_stick_obj.xml obj_slidex/obj_slidey)
        planar = scene.obj_planar > 0
        pos = sim.obj_pos
        vel = sim.obj_vel
        vel = vel + jnp.array([0.0, 0.0, -_GRAVITY]) * dt * (~planar[:, None])
        vel = vel * (1.0 - planar[:, None] * jnp.array([0.0, 0.0, 1.0]))
        visc = jnp.exp(
            -scene.obj_lin_damping * dt / jnp.maximum(scene.obj_mass, 1e-6)
        )
        vel = jnp.where(planar[:, None], vel * visc[:, None], vel)
        vel = jnp.where(pinned_anchor[:, None], 0.0, vel)
        # squirt: the over-squeezed body ejects along the pad axis away
        # from the claw center at the golden pop speed (~0.2 m/s); table
        # friction then parks it a few cm out
        ej_sign = jnp.sign(
            (sim.obj_pos + scene.obj_grasp_off)[:, 0] - sim.hand[0])
        ej_sign = jnp.where(ej_sign == 0.0, -1.0, ej_sign)
        vx_sq = jnp.where(
            squeezed_out,
            ej_sign * jnp.maximum(jnp.abs(vel[:, 0]), 0.2),
            vel[:, 0],
        )
        vel = vel.at[:, 0].set(vx_sq)
        # nonexistent (padding) slots are pinned: without this they
        # free-fall forever (their ground support is exists-gated), and the
        # drifting ghost state defeats block-specialized fast paths
        ex = (scene.obj_exists > 0)[:, None]
        vel = vel * ex
        pos = jnp.where(ex, pos + vel * dt, pos)

        # finger-pad pushing: the pads are thin vertical plates (world half
        # extents ~(0.015, 0.003, 0.045), ref xyz_base.xml:171,183) that cage
        # and drag objects; there is NO geometry between the fingers, so an
        # object between the open pads is untouched.
        left, right = pad_kinematics(sim.hand, sim.gripper)
        pad_half = jnp.array([0.015, 0.0045, 0.045])
        pad_push_depth = []  # per pad: (MAX_OBJ,) contact penetration
        pad_side_hit = []    # per pad: (MAX_OBJ,) bool, horizontal-normal contact
        # tangential stick per substep while in contact: flat objects (pucks,
        # plates, boxes) are dragged by the high-friction pads; spheres roll
        # instead of sticking
        blend_by_type = jnp.where(scene.obj_type == ObjType.SPHERE, 0.04, 0.35)
        for kin in (left, right):
            kin_c = kin  # pad box center already at tcp + PAD_Z_OFFSET

            def push_one(p, v, radius, half_x, half_h, blend, otype):
                # flat objects (pucks/plates/boxes): AABB-vs-AABB, push out
                # along the least-penetration axis. round objects (balls):
                # sphere-vs-box so grazing contacts deflect instead of
                # slamming along an axis. friction drags the object
                # tangentially with the pad (the reference's high-friction
                # pads slide plates around this way).
                obj_half = jnp.stack([half_x, radius, half_h])
                d = p - kin_c
                pen_box = (pad_half + obj_half) - jnp.abs(d)
                hit_box = jnp.all(pen_box > 0.0)
                axis = jnp.argmin(pen_box)
                hot = (jnp.arange(3) == axis).astype(d.dtype)
                d_axis = jnp.sum(hot * d)
                n_box = hot * jnp.where(d_axis >= 0, 1.0, -1.0)
                depth_box = jnp.where(hit_box, jnp.sum(hot * pen_box), 0.0)

                _, n_sph, pen_sph = _sphere_box_pushout(p, radius, kin_c, pad_half)
                is_sphere = otype == ObjType.SPHERE
                n = jnp.where(is_sphere, n_sph, n_box)
                depth = jnp.where(is_sphere, pen_sph, depth_box)
                hit = depth > 0.0

                # soft projection for spheres: grazing pad sweeps deflect the
                # ball instead of carrying it pinned at hand speed
                frac = jnp.where(is_sphere, 0.3, 1.0)
                p = p + frac * depth * n
                v_rel_n = jnp.dot(v - hand_vel, n)
                v = jnp.where(hit & (v_rel_n < 0.0), v - n * v_rel_n, v)
                # restitution for spheres: the ball squirts ahead of the push
                # so the contact breaks (rolling escape); ground friction then
                # brings it to rest — net effect matches MuJoCo's dribbling
                hand_n = jnp.dot(hand_vel, n)
                ball_n = jnp.dot(v, n)
                boost = jnp.where(
                    hit & is_sphere & (hand_n > 0.0) & (ball_n < 1.3 * hand_n),
                    1.3 * hand_n - ball_n,
                    0.0,
                )
                v = v + boost * n
                dv = hand_vel - v
                dv_t = dv - n * jnp.dot(dv, n)
                # a pad pressing DOWN on a flat object's top face drags it
                # at essentially hand speed — the weld supplies the normal
                # force and the pads' friction 2 pins the surface (golden
                # plate-slide-back: the puck trails the sweeping claw by a
                # constant ~30 mm for 400 steps). Side pushes keep the
                # calibrated partial drag.
                blend_eff = jnp.where(
                    (~is_sphere) & (jnp.abs(n[2]) > 0.7), 0.8, blend
                )
                v = v + jnp.where(hit, blend_eff, 0.0) * dv_t
                side_hit = hit & (jnp.abs(n[2]) < 0.7)
                return p, v, depth, side_hit

            p2, v2, depth2, side2 = jax.vmap(push_one)(
                pos, vel, scene.obj_radius, scene.obj_half_x, scene.obj_half_h,
                blend_by_type, scene.obj_type,
            )
            free = (sim.attached == 0) & (scene.obj_exists > 0) & ~pinned_anchor
            pos = jnp.where(free[:, None], p2, pos)
            vel = jnp.where(free[:, None], v2, vel)
            pad_push_depth.append(depth2 * scene.obj_exists)
            pad_side_hit.append(side2 & (scene.obj_exists > 0))

        # object-object contact (the stick scenes are the only two-free-
        # body scenes), symmetric resolution. Axis-separated AABB test so
        # rod x-extents (obj_half_x) participate: the golden stick-push
        # contact is the stick's end face on the container HANDLE's end
        # cap at 0.157 m of COM separation (stick box half 0.05 + handle
        # reach 0.107, ref sawyer_stick_obj.xml) — far outside any
        # sphere-radius sum. The separation splits by mobility: an
        # attached/pinned body is an immovable anchor; so is an
        # xy-limited planar body parked BEYOND its slide range — its
        # limit constraint outmuscles the contact (golden stick-push:
        # the container holds 6-8 mm past its +x stop against the held
        # stick for 400 steps).
        delta = pos[0] - pos[1]
        half_sum_oo = jnp.stack([
            scene.obj_oo_half_x[0] + scene.obj_oo_half_x[1],
            scene.obj_radius[0] + scene.obj_radius[1],
            scene.obj_half_h[0] + scene.obj_half_h[1],
        ])
        pen_ax_oo = half_sum_oo - jnp.abs(delta)
        hit_oo = jnp.all(pen_ax_oo > 0.0)
        ax_oo = jnp.argmin(pen_ax_oo)
        hot_oo = (jnp.arange(3) == ax_oo).astype(pos.dtype)
        d_ax_oo = jnp.sum(hot_oo * delta)
        n = hot_oo * jnp.where(d_ax_oo >= 0.0, 1.0, -1.0)
        pen = jnp.where(hit_oo, jnp.sum(hot_oo * pen_ax_oo), 0.0)
        # in link scenes (stick-pull) the tool tip passes THROUGH the ring
        # handle — no body contact, the hook link carries the interaction
        both = (
            (scene.obj_exists[0] > 0)
            & (scene.obj_exists[1] > 0)
            & (scene.link_enable == 0)
        )
        viol_oo = (
            jnp.minimum(pos[:, :2] - scene.obj_xy_lo, 0.0)
            + jnp.maximum(pos[:, :2] - scene.obj_xy_hi, 0.0)
        )
        beyond_range = (scene.obj_xy_limited > 0) & (
            jnp.sum(jnp.abs(viol_oo), axis=1) > 1e-9
        )
        mobile = ((sim.attached == 0) & ~pinned_anchor
                  & (scene.obj_exists > 0) & ~beyond_range)
        w_tot = jnp.maximum(mobile[0] + mobile[1] * 1.0, 1.0)
        w = mobile / w_tot  # (2,) fraction of the separation each body takes
        sign = jnp.array([[1.0], [-1.0]])  # +n moves obj0 away from obj1
        active = both & (pen > 0.0)
        pos = pos + sign * (jnp.where(active, pen, 0.0) * w[:, None]) * n[None, :]
        v_n = jnp.dot(vel[0] - vel[1], n)  # <0 = approaching along n
        approaching = v_n < 0.0
        vel = vel - sign * (
            jnp.where(active & approaching, v_n, 0.0) * w[:, None]
        ) * n[None, :]
        # a HELD pusher drags the contacted body tangentially: the weld
        # supplies the normal force and the rubbing friction carries the
        # lateral motion (golden stick-push walks the stop-jammed
        # container +y at essentially mocap speed for 400 steps)
        held_oo = sim.attached > 0
        drag_on = active & (held_oo[0] | held_oo[1])
        dv_oo = hand_vel[None, :] - vel
        dv_oo_t = dv_oo - n[None, :] * jnp.sum(
            dv_oo * n[None, :], axis=1, keepdims=True)
        take_oo = ((mobile & ~held_oo)[:, None]
                   * jnp.where(drag_on, 0.8, 0.0))
        vel = vel + dv_oo_t * take_oo

        # static boxes (walls, bins, shelves, pegs)
        box_pos, box_size = _static_boxes_world(scene, sim.fixture_pos)

        def box_contacts(p, r):
            def one(bp, bs, ex):
                corr, nrm, pen = _sphere_box_pushout(p, r, bp, bs)
                return corr * ex
            return jnp.sum(jax.vmap(one)(box_pos, box_size, scene.static_exists), axis=0)

        corr = jax.vmap(box_contacts)(pos, scene.obj_radius)
        free = (sim.attached == 0) & (scene.obj_exists > 0) & ~pinned_anchor
        pos = pos + corr * free[:, None]
        # kill the velocity component pointing into the box (along -correction)
        corr_n = maths.safe_normalize(corr)
        v_into = jnp.minimum(jnp.sum(vel * corr_n, axis=1, keepdims=True), 0.0)
        hit_box = (_norm(corr, axis=1) > 1e-9)[:, None] & free[:, None]
        vel = jnp.where(hit_box, vel - corr_n * v_into, vel)

        # ground / pit support
        _EZ = jnp.array([0.0, 0.0, 1.0])
        _EXY = jnp.array([1.0, 1.0, 0.0])

        def ground_one(p, v, half_h, fric, rolls):
            sz = _support_z(scene, p[:2])
            below = p[2] - half_h < sz
            p = p + _EZ * jnp.where(below, sz + half_h - p[2], 0.0)
            vz_new = jnp.where(below & (v[2] < 0.0), 0.0, v[2])
            # Coulomb friction on the tangential velocity while supported.
            # The friction impulse scales with the NORMAL impulse: resting
            # contact absorbs m*g*dt per substep, and a LANDING additionally
            # absorbs the whole downward speed — a block dropped while
            # sliding stops nearly dead on impact (golden sweep: the swept
            # block lands from its carry at 0.75 m/s horizontal and stops
            # within one control step; gravity-only friction coasted it
            # 55 mm past the reference). Exempt: spheres (a ball's contact
            # point rolls, the impact does not brake its center) and
            # xy-limited sliders (the reference's plate-slide pucks are
            # 2-dof slide-jointed with no vertical dof — any landing here
            # is an artifact of our z freedom, not a real impulse).
            absorbed = jnp.where(below & (v[2] < 0.0) & ~rolls, -v[2], 0.0)
            speed = _norm(v[:2])
            dec = fric * (_GRAVITY * dt + absorbed)
            scale = jnp.where(speed > 1e-9, jnp.maximum(speed - dec, 0.0) / jnp.maximum(speed, 1e-9), 0.0)
            xy_scale = jnp.where(below, scale, 1.0)
            v = v * (_EXY * xy_scale) + _EZ * vz_new
            return p, v

        frics = scene.obj_friction * (1.0 - scene.obj_planar)
        rolls = (scene.obj_type == ObjType.SPHERE) | (scene.obj_xy_limited > 0)
        pos_g, vel_g = jax.vmap(ground_one)(pos, vel, scene.obj_half_h, frics,
                                            rolls)
        pos = jnp.where(free[:, None], pos_g, pos)
        vel = jnp.where(free[:, None], vel_g, vel)

        # planar bodies are pinned AT their plane height (contacts above
        # cannot lift them, the slide joints have no vertical dof)
        sz_pl = jax.vmap(lambda p: _support_z(scene, p[:2]))(pos)
        z_pin = sz_pl + scene.obj_half_h
        pin_row = (planar & free)[:, None]
        pos = jnp.where(pin_row, pos * _EXY + _EZ * z_pin[:, None], pos)
        vel = jnp.where(pin_row, vel * _EXY, vel)

        # limited slide joints (the plate-slide puck: 2 slides with range
        # x [-0.2, 0.2], y [0.6, 0.9], ref objects/assets/puck.xml:5-6).
        # MuJoCo limits are SOFT: the golden plate-slide-side trace holds
        # the pressed puck ~0.13 past its stop — model a stiff spring plus
        # heavy damping outside the range, not a hard clamp.
        viol = (
            jnp.minimum(pos[:, :2] - scene.obj_xy_lo, 0.0)
            + jnp.maximum(pos[:, :2] - scene.obj_xy_hi, 0.0)
        )
        lim_on = (scene.obj_xy_limited * free)[:, None]
        # a pad pressing the object's SIDE holds it statically against the
        # limit spring (direct normal force — golden plate-slide-side parks
        # the pressed puck 0.13 past its stop); a top-drag carry only
        # friction-holds and the spring yields it back (back-side golden
        # oscillates within ~0.04 of the stop)
        side_held = (pad_side_hit[0] | pad_side_hit[1])[:, None]
        outside = lim_on * (jnp.abs(viol) > 0.0)
        vel = vel.at[:, :2].add(
            -_K_SLIDE_LIM * viol * dt * lim_on * (1.0 - side_held)
        )
        vel = vel.at[:, :2].multiply(
            1.0 - outside * (1.0 - jnp.exp(-_D_SLIDE_LIM * dt))
        )

        # jam back-reaction: a free object PINNED by walls or slide limits
        # pushes the HAND back out — in MuJoCo the hand->object->wall chain
        # is a contact chain and the weld yields (golden plate-slide-side:
        # the claw parks at the jammed puck's face, never inside it). The
        # object pushout above resolves the full pad overlap, so any
        # overlap REMAINING here is exactly the amount the scene pushed
        # the object back in. Non-graspable objects only: a caged object
        # legitimately sits between the pads.
        jam_corr = jnp.zeros(3)
        for kin_c_j in (left, right):
            def jam_one(p, half_x, radius, half_h, ex, grasp, att, otype):
                obj_half = jnp.stack([half_x, radius, half_h])
                d = kin_c_j - p  # pad rel object: push the HAND outward
                pen = (pad_half + obj_half) - jnp.abs(d)
                # spheres excluded: their pushout is a SOFT projection
                # (frac 0.3) that leaves residual overlap by design
                hit = (
                    jnp.all(pen > 0.0) & (ex > 0) & (grasp == 0)
                    & (att == 0) & (otype != ObjType.SPHERE)
                )
                axis = jnp.argmin(pen)
                hot = (jnp.arange(3) == axis).astype(d.dtype)
                n = hot * jnp.where(jnp.sum(hot * d) >= 0, 1.0, -1.0)
                return jnp.where(hit, jnp.sum(hot * pen), 0.0) * n
            jam_corr = jam_corr + jnp.sum(
                jax.vmap(jam_one)(pos, scene.obj_half_x, scene.obj_radius,
                                  scene.obj_half_h, scene.obj_exists,
                                  scene.obj_graspable, sim.attached,
                                  scene.obj_type),
                axis=0,
            )
        jc_n = _norm(jam_corr)
        move_h = _norm(new_hand - sim.hand)
        jam_corr = jam_corr * jnp.minimum(
            1.0, (move_h + 0.0005) / jnp.maximum(jc_n, 1e-9)
        )
        new_hand = new_hand + jam_corr
        hand_vel = (new_hand - sim.hand) / dt

        # attached objects ride the hand — but never through the table (a
        # dragged puck stays supported; only lifting raises it)
        att_pos = new_hand[None, :] + attach_off
        att_support = jax.vmap(lambda p: _support_z(scene, p[:2]))(att_pos)
        att_z = jnp.maximum(att_pos[:, 2], att_support + scene.obj_half_h)
        # link prop: an inserted tool rests on the ring handle — the hand
        # cannot drag it below (the grip slips instead)
        tool_prev = sim.obj_pos[0] + maths.quat_rotate(
            sim.obj_quat[0], scene.obj_tool_off[0])
        handle_prev = sim.obj_pos[1] + scene.link_handle_off
        linked_prev = (
            (scene.link_enable > 0)
            & (tool_prev[0] >= handle_prev[0])
            & (jnp.abs(tool_prev[1] - handle_prev[1]) <= 0.045)
            & (jnp.abs(tool_prev[2] - handle_prev[2]) <= 0.065)
        )
        e0 = jnp.array([1.0, 0.0])
        att_z = att_z + e0 * jnp.where(
            linked_prev, jnp.maximum(att_z[0], handle_prev[2] - 0.04) - att_z[0], 0.0
        )
        # grip slip: while the support pins a gripped object, the fingers
        # slide along it — the grip offset re-seats to the pinned position
        # (MuJoCo's friction grip does this implicitly). Without this, carry
        # policies deadlock at hover/descend branch boundaries.
        pinned = (attached > 0) & (att_pos[:, 2] < att_z - 1e-9)
        ezc = jnp.array([0.0, 0.0, 1.0])[None, :]
        off_z_new = jnp.where(pinned, att_z - new_hand[2], attach_off[:, 2])
        attach_off = attach_off * (1.0 - ezc) + ezc * off_z_new[:, None]
        att_pos = att_pos * (1.0 - ezc) + ezc * att_z[:, None]
        # carried objects still collide with the static scene: a gripped
        # ball striking the basket pole (or a carried block hitting a
        # shelf lip) stops BOTH the object and the hand — the grip is
        # rigid and the weld yields (golden basketball traces: the
        # carrying hand stalls at the hoop while the mocap marches on).
        # The object and hand shift together, so attach_off is unchanged.
        # Exception — SHALLOW walls deflect the drag upward instead of
        # deadlocking it: the weld's push tilts a dragged lid into a climb
        # over the lip (golden box-close: the lid rides +5 cm up the box
        # wall over ~10 control steps while the hand keeps advancing).
        # Climb only when the contact is lateral and the top escape is
        # within the climb window; the rise is capped per substep and goes
        # into attach_off (the object slips UP in the grip — a wall cannot
        # lift the arm).
        def climb_one(p, r):
            def one(bp, bs, ex):
                _, n, pen = _sphere_box_pushout(p, r, bp, bs)
                pen_up = (bp[2] + bs[2] + r) - p[2]
                lateral = jnp.abs(n[2]) < 0.5
                ok = (
                    (ex > 0) & lateral & (pen > 1e-6)
                    & (pen_up > 0.0) & (pen_up < 0.045)
                )
                return jnp.where(ok, jnp.minimum(pen_up, 0.0015), 0.0)
            return jnp.max(jax.vmap(one)(box_pos, box_size, scene.static_exists))

        climb = jax.vmap(climb_one)(att_pos, scene.obj_radius) * attached
        att_pos = att_pos.at[:, 2].add(climb)
        attach_off = attach_off.at[:, 2].add(climb)
        corr_att = jax.vmap(box_contacts)(att_pos, scene.obj_radius)
        corr_att = corr_att * (attached > 0)[:, None]
        att_pos = att_pos + corr_att
        new_hand = new_hand + jnp.sum(corr_att, axis=0)
        # attached-tool chain jam: a held tool overlapping a body parked
        # BEYOND its slide range cannot advance — the stop force chains
        # tool -> grip -> weld and parks the HAND (golden stick-push:
        # hand+stick stall 0.17 m short of the mocap against the
        # container's +x stop, tcp x 0.335 vs mocap 0.5). The remaining
        # overlap resolves onto the hand (grip rigid, weld yields); xy
        # only — z is the grip-slip support's job.
        jam_h = jnp.zeros(3)
        for i_, j_ in ((0, 1), (1, 0)):
            dj = att_pos[i_] - pos[j_]
            pen_ax_j = half_sum_oo - jnp.abs(dj)
            hit_j = (
                jnp.all(pen_ax_j > 0.0) & (attached[i_] > 0)
                & beyond_range[j_] & (scene.obj_exists[i_] > 0)
                & (scene.obj_exists[j_] > 0) & (scene.link_enable == 0)
            )
            axj = jnp.argmin(pen_ax_j)
            hotj = (jnp.arange(3) == axj).astype(dj.dtype)
            nj = hotj * jnp.where(jnp.sum(hotj * dj) >= 0.0, 1.0, -1.0)
            corr_j = nj * jnp.where(hit_j, jnp.sum(hotj * pen_ax_j), 0.0)
            jam_h = jam_h + corr_j * jnp.array([1.0, 1.0, 0.0])
        # grip slip along the jam: the pads hold the rod only by friction,
        # so the stop force first drags the rod THROUGH the grip — the
        # golden stick-push tcp ends 34 mm east of the jammed stick COM,
        # which is what flips the reward's razor-thin `tcp_to_stick <
        # 0.02` holding gate — and only once the rod's end reaches the
        # pads (~35 mm of travel) does the claw itself park.
        jam_n = _norm(jam_h)
        jam_dir = jam_h / jnp.maximum(jam_n, 1e-9)
        proj_slip = jnp.sum(
            (attached > 0)
            * jnp.sum(attach_off * jam_dir[None, :], axis=1))
        slip_g = jnp.clip(0.035 - proj_slip, 0.0, jam_n)
        slip_vec = jam_dir * slip_g
        attach_off = attach_off + slip_vec[None, :] * (attached > 0)[:, None]
        att_pos = att_pos + jam_h[None, :] * (attached > 0)[:, None]
        new_hand = new_hand + (jam_h - slip_vec)
        pos = jnp.where((attached > 0)[:, None], att_pos, pos)
        vel = jnp.where((attached > 0)[:, None], hand_vel[None, :], vel)

        # --- rotational dynamics ---
        # obj_quat is the DELTA rotation from the reset orientation (wxyz);
        # the reference integrates full rigid-body rotation via MuJoCo
        # (live body xquat feeds obs[7:11] and the quat-gated rewards, ref
        # sawyer_xyz_env.py:475-511, sawyer_assembly_peg_v3.py:219-226).
        # Here three regimes cover what the 50 tasks actually exercise:
        #   * spheres roll without slipping on their support (soccer ball,
        #     basketball): omega = (z x v) / r
        #   * supported flat objects right themselves: the tilt component
        #     decays toward the pure-yaw twist (table friction), spin decays
        #   * a gripped object pitches about the pad axis toward a
        #     per-task equilibrium droop (gravity torque on an off-center
        #     grasp vs pad torsional compliance, scene.obj_droop); for
        #     link scenes the tilt engages only once the tool is inserted
        #     (the stick tips because its far end rests on the handle)
        support_under = jax.vmap(lambda p: _support_z(scene, p[:2]))(pos)
        on_ground = (pos[:, 2] - scene.obj_half_h) <= (support_under + 1e-4)
        is_sphere = scene.obj_type == ObjType.SPHERE
        free_rot = (attached == 0) & (scene.obj_exists > 0) & ~pinned_anchor
        omega = sim.obj_angvel
        ez3 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), vel.shape)
        roll_w = jnp.cross(ez3, vel) / jnp.maximum(scene.obj_radius, 1e-6)[:, None]
        omega = jnp.where((is_sphere & on_ground & free_rot)[:, None], roll_w, omega)
        omega = jnp.where((~is_sphere & on_ground & free_rot)[:, None],
                          omega * jnp.exp(-dt / 0.04), omega)
        omega = omega * (free_rot[:, None] & (scene.obj_exists > 0)[:, None])
        quat = jax.vmap(maths.quat_integrate, in_axes=(0, 0, None))(
            sim.obj_quat, omega, dt)
        # supported non-spheres: tilt decays toward the pure-yaw twist
        # (degenerate twist — a ~180° tilt — falls back to identity)
        twist = quat * jnp.array([1.0, 0.0, 0.0, 1.0])
        tn = _norm(twist, axis=1)[:, None]
        twist = jnp.where(tn > 0.05, twist / tn,
                          jnp.broadcast_to(maths.quat_identity(), quat.shape))
        alpha_r = 1.0 - jnp.exp(-dt / 0.08)
        righted = maths.quat_nlerp(quat, twist, alpha_r)
        quat = jnp.where((~is_sphere & on_ground & free_rot)[:, None], righted, quat)
        # in-grip droop toward axis_angle(y, obj_droop)
        droop_on = jnp.where(scene.link_enable > 0,
                             jnp.where(linked_prev, 1.0, 0.0), 1.0)
        theta_eq = scene.obj_droop * droop_on
        ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (quat.shape[0], 3))
        q_droop = jax.vmap(maths.axis_angle_quat)(ey, theta_eq)
        alpha_d = 1.0 - jnp.exp(-dt / 0.35)
        drooped = maths.quat_nlerp(quat, q_droop, alpha_d)
        quat = jnp.where((attached > 0)[:, None], drooped, quat)

        # --- tool link (stick-pull): when obj0's tool tip is hooked through
        # obj1's handle (the reference's _stick_is_inserted geometry,
        # sawyer_stick_pull_v3.py:187-194), obj1 is dragged with obj0 ---
        tool_pt = pos[0] + maths.quat_rotate(quat[0], scene.obj_tool_off[0])
        handle_pt = pos[1] + scene.link_handle_off
        linked = (
            (scene.link_enable > 0)
            & (tool_pt[0] >= handle_pt[0])
            & (jnp.abs(tool_pt[1] - handle_pt[1]) <= 0.040)
            & (jnp.abs(tool_pt[2] - handle_pt[2]) <= 0.060)
        )
        # geometric hook: the ring is dragged only to keep the shaft inside
        # its opening — the tip cap catches when the shaft would exit west
        # (tool_x < handle_x) and the shaft walls give ~3cm lateral slack
        dy_link = tool_pt[1] - handle_pt[1]
        corr_link = jnp.stack([
            jnp.minimum(tool_pt[0] - handle_pt[0], 0.0),
            dy_link - jnp.clip(dy_link, -0.03, 0.03),
            0.0,
        ])
        pos = pos + jnp.array([[0.0], [1.0]]) * (
            jnp.where(linked, 1.0, 0.0) * corr_link
        )[None, :]

        # --- fixture mechanisms ---
        # Free dynamics use the COMPILED reference model's constants
        # (scripts/compiled_truth.py): generalized inertia M[dof,dof],
        # joint damping, spring, and gravity from the subtree mass/COM.
        # The damped ODE is integrated EXACTLY over the substep
        # (exponential integrator) because the true fixtures are stiff:
        # e.g. handle-press has M=0.003, damping=30 (tau = 0.1 ms << dt),
        # where explicit Euler would oscillate unboundedly.
        q, qv = sim.joint_q, sim.joint_v
        # generalized gravity force Q_g = (d com / d q) . (0, 0, -m g):
        # slide: dcom/dq = axis; hinge: axis x r_com(q)
        q_rot = jax.vmap(maths.axis_angle_quat)(scene.joint_axis, q)
        com_arm = jax.vmap(maths.quat_rotate)(q_rot, scene.joint_com)
        is_hinge_j = scene.joint_type == JointType.HINGE
        dcom_dq = jnp.where(
            is_hinge_j[:, None],
            jnp.cross(scene.joint_axis, com_arm),
            scene.joint_axis,
        )
        grav_q = -scene.joint_mass * _GRAVITY * dcom_dq[:, 2]
        f_ext = (
            grav_q
            + scene.joint_bias
            - scene.joint_stiffness * (q - scene.joint_springref)
        )
        M_j = jnp.maximum(scene.joint_inertia, 1e-6)
        c_j = scene.joint_damping
        decay = jnp.exp(-c_j * dt / M_j)
        # exact solution of M qv' = f_ext - c qv with f_ext frozen over dt
        qv = jnp.where(
            c_j > 1e-9,
            qv * decay + (f_ext / jnp.maximum(c_j, 1e-9)) * (1.0 - decay),
            qv + (f_ext / M_j) * dt,
        )
        q_free = q + qv * dt

        handle = fixture_handle_pos(scene, sim.fixture_pos, q_free)  # (MAX_JOINT,3)
        motion = fixture_motion_dir(scene, sim.fixture_pos, q_free)  # (MAX_JOINT,3)
        # hinge lever radius: handle displacement per unit q (slides: 1)
        arm_perp = scene.joint_arm - jnp.sum(
            scene.joint_arm * scene.joint_axis, axis=1, keepdims=True
        ) * scene.joint_axis
        lever = jnp.where(is_hinge_j, _norm(arm_perp, axis=1), 1.0)
        lever = jnp.maximum(lever, 1e-6)

        # hook: the closed claw ENCIRCLES a hookable handle knob. Engage when
        # the knob sits in the claw's capture volume — pads straddle it in
        # xy (55 mm reach: pad footprint + knob radius), knob height within
        # the finger span (golden drag offsets: dial grabs 46 mm BELOW the
        # tcp, lever up to +130 mm above — the claw wraps different heights
        # of different handles). The joint then follows the claw's
        # fixture-inverse coordinate WITH the offset captured at engagement
        # (q - inverse), so hooking never teleports the handle to the hand.
        tcp_mid = new_hand + jnp.array([0.0, 0.0, PAD_Z_OFFSET * 0.6])
        rel_h = handle - new_hand[None, :]
        d_xy = _norm(rel_h[:, :2], axis=1)
        d_z = rel_h[:, 2]
        in_claw = (d_xy < 0.055) & (d_z > -0.06) & (d_z < 0.10)
        q_inv = fixture_inverse(scene, sim.fixture_pos, tcp_mid)
        # engagement additionally requires the claw's fixture-inverse
        # coordinate to MATCH the joint within the claw's physical play —
        # a claw descending toward a handle bar passes through the volume
        # gate well before the mouth is actually on the bar, and a hook
        # captured there would freeze a premature offset into the whole
        # drag (handle-pull then lifts the claw through its play without
        # ever moving the handle)
        off_cap = jnp.where(scene.joint_type == JointType.HINGE, 0.15, 0.02)
        dq_cap = q - q_inv
        dq_cap = jnp.where(
            scene.joint_type == JointType.HINGE,
            jnp.mod(dq_cap + jnp.pi, 2.0 * jnp.pi) - jnp.pi,
            dq_cap,
        )
        # engagement hysteresis on the weld's perpendicular stretch: a slip
        # (below) fires past _HOOK_SLIP, and the claw cannot re-wrap while
        # the weld still pulls it hard off the handle — without this a
        # parked mocap far under a slipped lever re-hooks every substep and
        # the slip never takes effect
        gap_w = target[None, :] - new_hand[None, :]
        gap_perp_n = _norm(
            gap_w - motion * jnp.sum(gap_w * motion, axis=1, keepdims=True),
            axis=1,
        )
        hook_now = (
            (scene.joint_hookable > 0)
            & in_claw
            & (jnp.abs(dq_cap) <= off_cap)
            & (effort > 0.0)
            & (gripper < 0.9)
            & (gap_perp_n < _HOOK_SLIP - 0.03)
        )
        newly_hooked = hook_now & (sim.hooked == 0)
        hook_off = jnp.where(newly_hooked, dq_cap, sim.hook_off)
        hooked = jnp.where(hook_now, 1.0, sim.hooked)
        # the squeezed wrap is RIGID perpendicular to the joint's motion:
        # capture the hand-to-handle offset in the joint frame; while
        # hooked the hand is locked to handle + R(q) . offset there (the
        # golden faucet/lever traces hold the tcp at a fixed standoff from
        # the orbiting handle until the grip slips)
        q_rot_now = jax.vmap(maths.axis_angle_quat)(scene.joint_axis, -q)
        off_local_now = jax.vmap(maths.quat_rotate)(
            q_rot_now, new_hand[None, :] - handle
        )
        off_local_now = jnp.where(
            is_hinge_j[:, None], off_local_now, new_hand[None, :] - handle
        )
        hook_hoff = jnp.where(
            newly_hooked[:, None], off_local_now, sim.hook_hoff
        )
        # a squeezed handle WEDGES toward the grip center (the pads pinch
        # below the bar's equator and extrude it up the claw — golden
        # handle-pull traces show the bar rising ~1.5 mm/step while the
        # hand holds still and the grip closes): the captured offset
        # decays while hooked with the grip driving closed. The squirt is
        # VERTICAL (up the claw mouth), so it moves the joint only to the
        # extent its motion direction is vertical — a faucet knob orbiting
        # in the horizontal plane must not creep azimuthally.
        vert = jnp.abs(fixture_motion_dir(scene, sim.fixture_pos, q)[:, 2])
        wedge = jnp.where(
            (effort > 0.0) & (hooked > 0),
            (1.0 - jnp.exp(-dt / 0.15)) * vert,
            0.0,
        )
        hook_off = hook_off * (1.0 - wedge)
        # release is looser than capture: the contact point slides along the
        # handle during a drag (lever swings to +130 mm above the tcp)
        # slip: the squeezed grip holds only so much weld pull PERPENDICULAR
        # to the joint's motion — past the friction budget the claw pops off
        # the bar (golden faucet: the tcp rides the handle for ~30 steps of
        # downward mocap drag, then slips under it in 3 steps). The motion-
        # axis component normally drives the joint instead of loading the
        # grip, but when the joint is RANGE-PINNED it loads the grip too —
        # the TOTAL-stretch bound covers that (a wrap parked on a range
        # stop must rip off rather than deadlock the arm). The total bound
        # is GATED on the stop: a mid-range joint under a huge motion-axis
        # stretch is simply being dragged (golden lever-pull: the wrapped
        # ball follows the table-pinned hand's 0.5 mm/step creep for 250
        # steps while the mocap parks 0.36 m away — an ungated rip-off
        # froze the lever at the slip instant).
        at_stop = (q <= scene.joint_range[:, 0] + 1e-6) | (
            q >= scene.joint_range[:, 1] - 1e-6
        )
        slip = (gap_perp_n > _HOOK_SLIP) | (
            at_stop & (_norm(gap_w, axis=1) > 2.0 * _HOOK_SLIP)
        )
        # a wrap on a long VERTICAL bar (the door's handle post) is a
        # sliding COLLAR, not a rigid pinch: excess weld pull slides the
        # fingers along the bar to the edge of the pad footprint and the
        # pinch holds there — it never pops off (golden door-open: the
        # mocap parks 0.22 m past the open door's handle and the claw
        # stays wrapped, 25-35 mm up-pull of the bar, for 400 steps). The
        # collar lock below clamps the lateral offset instead.
        collar_j = (
            (_norm(scene.joint_face_dir, axis=1) > 0.5)
            & (jnp.abs(scene.joint_face_dir[:, 2]) > 0.9)
            & (scene.joint_face_radius >= 0.06)
        )
        slip = slip & ~collar_j
        unhook = (
            (effort <= 0.0) | (d_xy > 0.12) | (d_z < -0.15) | (d_z > 0.2)
            | slip
        )
        hooked = jnp.where(unhook, 0.0, hooked) * scene.joint_exists

        # press: gripper parts push the handle KINEMATICALLY — the contact
        # is resolved by projecting the joint out of penetration (the mocap
        # weld is far stiffer than any fixture, so in MuJoCo the fixture
        # always yields to the hand; a penalty force would need per-task
        # stiffness tuning, projection is exact). Parts model the real claw
        # assembly (ref xyz_base.xml:151-188): fingertip at the tcp, the two
        # pad plates, and the knuckle block above them.
        knuckle = new_hand + jnp.array([0.0, 0.0, 0.105])
        press_dq = []  # per part: (MAX_JOINT,) signed projection
        # press-face center = handle point + press_off rotated with the joint
        q_rot_free = jax.vmap(maths.axis_angle_quat)(scene.joint_axis, q_free)
        press_pt_off = jax.vmap(maths.quat_rotate)(q_rot_free, scene.joint_press_off)

        press_fd = jax.vmap(maths.quat_rotate)(q_rot_free, scene.joint_face_dir)
        has_bar = _norm(scene.joint_face_dir, axis=1) > 0.5

        _BIG_QV = 1e9

        def _vel_bounds(live, side, center, center_prev, lv, weight):
            """Inelastic contact velocity bounds on the joint: a face in
            live press contact with a part on side s cannot move toward
            that part faster than the part itself moves — without this, a
            COASTING fixture (low-damping drawer/door) that catches up to
            a slowly-retreating claw part derives a bogus velocity from
            the move-capped projection, tunnels through the part, and
            glides away (MuJoCo's contacts are inelastic: the drawer
            decelerates to the claw's speed and keeps tracking it)."""
            vn_q = jnp.sum((center - center_prev)[None, :] * motion, axis=1) / dt / lv
            act = live & (weight > 0.25)
            hi = jnp.where(act & (side > 0.0), vn_q, _BIG_QV)
            lo = jnp.where(act & (side < 0.0), vn_q, -_BIG_QV)
            return hi, lo

        def sphere_part(center, center_prev, r_part, station=None,
                        station_lever=None, weight=1.0, r_face=None):
            """Press contact of a claw part (sphere) against the handle's
            press geometry — an isotropic DISC of lateral radius
            `joint_face_radius` (button caps), or, when `joint_face_dir` is
            set, a CAPSULE bar of radius `joint_handle_radius` and
            half-length `joint_face_radius` (handle levers, drawer bars).
            Resolution is along the motion axis, TWO-SIDED with hysteresis:
            the side is chosen from the part's PREVIOUS position, so a part
            that tunnels past the face while the joint sits at a range stop
            (the kinematic hand keeps tracking) cannot flip the contact and
            yank the joint off the stop — the stop residual pushes the HAND
            back out instead, which keeps u on the approach side."""
            pt0 = (handle + press_pt_off) if station is None else station
            lv = lever if station_lever is None else station_lever
            face_r = scene.joint_handle_radius if r_face is None else r_face
            # capsule: nearest point on the bar segment to the part
            s_near = jnp.clip(
                jnp.sum((center[None, :] - pt0) * press_fd, axis=1),
                -scene.joint_face_radius, scene.joint_face_radius,
            )
            pt = jnp.where(has_bar[:, None], pt0 + s_near[:, None] * press_fd, pt0)
            d3 = center[None, :] - pt
            u = jnp.sum(d3 * motion, axis=1)   # part along +motion, rel face
            u_prev = jnp.sum((center_prev[None, :] - pt) * motion, axis=1)
            side = jnp.where(jnp.abs(u_prev) > 1e-9, jnp.sign(u_prev), jnp.sign(u))
            side = jnp.where(side == 0.0, 1.0, side)
            perp = d3 - u[:, None] * motion
            pd = _norm(perp, axis=1)
            r_sum = face_r + r_part
            # effective clearance along motion at this lateral offset:
            # capsule cross-section for bars, full depth for discs
            # NB 1e-24 floor, not 0: sqrt'(0)=inf would NaN the backward
            # pass through the unselected branch (see _norm)
            eff_r = jnp.where(
                has_bar,
                jnp.sqrt(jnp.maximum(r_sum * r_sum - pd * pd, 1e-24)),
                r_sum,
            )
            in_face = jnp.where(
                has_bar,
                pd < r_sum,
                pd < scene.joint_face_radius + 0.6 * r_part,
            )
            pen = eff_r - side * u   # penetration toward the approach side
            # far-side gate: > one radius past the center is a ghost contact
            live = in_face & (pen > 0.0) & (side * u > -r_sum)
            # a kinematic contact cannot push the handle farther than the
            # part itself moved TOWARD THE FACE this substep (+0.5 mm settle
            # slack): a part that ENTERS the face footprint laterally
            # (in_face flips on with u already small) must shove at its own
            # approach speed, not project the full overlap depth in one
            # substep — uncapped, a graze slams hinged doors to their range
            # stop. The cap must be the APPROACH component (-side * du):
            # funding it from the total or receding motion lets a part that
            # still overlaps while moving AWAY keep pressing at full speed —
            # an open claw straddling a drawer bar then has its retreating
            # knuckle press the drawer closed exactly as fast as the pad
            # drags it open, deadlocking the joint at q=0.
            du = jnp.sum((center - center_prev)[None, :] * motion, axis=1)
            move_cap = jnp.maximum(-side * du, 0.0) + 0.0005
            pen = jnp.minimum(pen, move_cap)
            # part on the +motion side (side +) is pushed away by -q motion
            dq_p = weight * jnp.where(live, -side * pen, 0.0) / lv
            return dq_p, *_vel_bounds(live, side, center, center_prev, lv, weight)

        # the wrist/knuckle BLOCK above the pads is a fat box, not a point:
        # the compiled right_hand collision mesh bbox is ~(0.03,0.04,0.05)
        # half-extent, and the window golden traces equilibrate the pushed
        # bar edge 0.030 m from the knuckle center (= 0.022 + bar r 0.008).
        # The hand never rotates (fixed mocap quat), so the box is
        # world-axis-aligned. Used against capsule-BAR fixtures (window
        # handles), where the sphere model misses the lateral overlap.
        _KNUCKLE_HALF = jnp.array([0.022, 0.040, 0.053])

        def box_part(center, center_prev, half, bar_only=False, weight=1.0,
                     disc_yield=False):
            """Press contact of a world-axis-aligned BOX claw part (the hand
            never rotates — fixed mocap quat) against the handle's press
            geometry: the capsule bar when `joint_face_dir` is set, else the
            disc face. Resolution is a slab test along the motion axis with
            per-axis lateral overlap gates; the motion axis is auto-passed
            via the (1-|motion|) mask (slide fixtures have axis-aligned
            motion; hinge tangents degrade gracefully)."""
            pt0 = handle + press_pt_off
            s_near = jnp.clip(
                jnp.sum((center[None, :] - pt0) * press_fd, axis=1),
                -scene.joint_face_radius, scene.joint_face_radius,
            )
            pt = jnp.where(has_bar[:, None], pt0 + s_near[:, None] * press_fd, pt0)
            d3 = center[None, :] - pt
            u = jnp.sum(d3 * motion, axis=1)
            u_prev = jnp.sum((center_prev[None, :] - pt) * motion, axis=1)
            side = jnp.where(jnp.abs(u_prev) > 1e-9, jnp.sign(u_prev), jnp.sign(u))
            side = jnp.where(side == 0.0, 1.0, side)
            h_m = jnp.sum(half[None, :] * jnp.abs(motion), axis=1)
            # lateral gate: clamp the face point into the box to find the
            # box-surface gap, then require its component PERPENDICULAR to
            # the motion axis to be within the press geometry's lateral
            # reach (bar cross-section radius, or the disc's face radius).
            # The exact closest-point form is required for diagonal motion
            # axes (door-lock's lever slides along (-0.55, 0, -0.84)): the
            # old per-axis |lat|*(1-|m|) <= half+r heuristic down-weighted
            # the lateral offset on partially-motion axes, letting a pad
            # 11 cm from the lock face register a phantom press whose
            # range-stop residual then Coulomb-froze the hand.
            rel = pt - center[None, :]
            closest = jnp.clip(rel, -half[None, :], half[None, :])
            gap_vec = rel - closest
            gap_lat = gap_vec - jnp.sum(
                gap_vec * motion, axis=1, keepdims=True
            ) * motion
            lat_r = jnp.where(
                has_bar, scene.joint_handle_radius, scene.joint_face_radius
            )
            lat_ok = _norm(gap_lat, axis=1) <= lat_r
            depth = h_m + scene.joint_handle_radius
            live = lat_ok & (side * u > -depth)
            if bar_only:
                live = live & has_bar
            pen = depth - side * u
            live = live & (pen > 0.0)
            # same approach-gated lateral-entry cap as sphere_part
            du = jnp.sum((center - center_prev)[None, :] * motion, axis=1)
            pen = jnp.minimum(pen, jnp.maximum(-side * du, 0.0) + 0.0005)
            dq_p = weight * jnp.where(live, -side * pen, 0.0) / lever
            hi, lo = _vel_bounds(live, side, center, center_prev, lever, weight)
            if disc_yield:
                # a thin plate pressing a horizontally-pressed disc cap is
                # SOFT: replaying the golden actions through the live
                # reference model shows the claw plates 9-30 mm INSIDE the
                # cap at equilibrium (solimp .8/.9, button-press leftclaw
                # -9 mm + right_hand mesh -34 mm; button-press-wall claw
                # -30 mm past the cap face) — the plate never rigidly
                # stops the hand there, and the cap moves SUB-1:1 with the
                # penetrating plate (face travel / claw travel: 0.77
                # button-press, 0.61 wall — the bore friction and cap
                # compliance eat the rest). Model: press ratio 0.65, no
                # settle slack (a parked hand must not creep the cap to
                # its stop: the wall trace holds the button mid-travel,
                # bore friction), demand clamped to the remaining travel
                # so a bottomed cap truncates nothing -> no hand backoff.
                # Vertical presses, hinges and capsule bars stay rigid.
                rigid = (
                    has_bar
                    | (jnp.abs(motion[:, 2]) >= 0.5)
                    | (scene.joint_type == JointType.HINGE)
                )
                pen_ns = jnp.minimum(
                    0.65 * (depth - side * u),
                    jnp.maximum(-side * du, 0.0),
                )
                dq_soft = weight * jnp.where(live, -side * pen_ns, 0.0) / lever
                room_lo = jnp.minimum(scene.joint_range[:, 0] - q_free, 0.0)
                room_hi = jnp.maximum(scene.joint_range[:, 1] - q_free, 0.0)
                dq_soft = jnp.clip(dq_soft, room_lo, room_hi)
                # a soft plate RIDING INSIDE the cap keeps the finger
                # joint loaded (gripper yield below, gated there on weld
                # stretch) — side/approach gates don't apply: the plate
                # presses or has tunnelled into the cap volume
                soft_press.append(
                    lat_ok & ~rigid
                    & (jnp.abs(u) < depth + 0.045)
                    & (scene.joint_exists > 0)
                )
                dq_p = jnp.where(rigid, dq_p, dq_soft)
                # spring-back guard: the cap cannot move TOWARD a live
                # plate faster than the plate itself recedes (MuJoCo's
                # contact is inelastic) — but unlike the rigid two-sided
                # bound this never FORCES the cap forward, so the active
                # press keeps the soft ratio while a PARKED plate rigidly
                # blocks the spring return (golden wall closed loop: the
                # cap peaked at 0.050 and sprang 22 mm back through the
                # parked claw to the bore-hold depth, aborting the press
                # short of its success threshold).
                vn_q = jnp.sum(
                    (center - center_prev)[None, :] * motion, axis=1
                ) / dt / lever
                live_soft = live & ~rigid
                lo_soft = jnp.where(
                    live_soft & (side < 0), jnp.minimum(vn_q, 0.0), -_BIG_QV
                )
                hi_soft = jnp.where(
                    live_soft & (side > 0), jnp.maximum(vn_q, 0.0), _BIG_QV
                )
                hi = jnp.where(rigid, hi, hi_soft)
                lo = jnp.where(rigid, lo, lo_soft)
                # FACE-ON jam: when the plate's footprint covers the cap
                # axis, the wedged claw does bind — ~30 mm inside the face
                # plane (golden button-press-wall: ref claw face parks
                # 30 mm past the cap face, tcp +0.716 vs face 0.734, and
                # the cap HOLDS there against its return spring — the rod
                # jams in its bore). The jam contact both stops the hand
                # (residual backoff) and, via its inelastic bound, keeps
                # the sprung cap from popping back through the plate.
                # the approach side is FIXED (-motion: the face is
                # presented toward the hand and pressed along +q) — the
                # per-substep side hysteresis flips once the plate crosses
                # the face plane and would disarm the jam. The jam does
                # NOT press the cap further (the ref cap parks at 0.734
                # while the tcp still creeps +6 mm): it ejects the HAND
                # via the backoff path and its inelastic bound keeps the
                # sprung cap from popping back through the plate.
                faceon = (~rigid) & (_norm(gap_lat, axis=1) < 0.005)
                excess = u - (0.030 - depth)
                # the EJECT binds deeper than the hold: the golden wall
                # trace's plate parks ~31 mm inside the face (the hold
                # must already ratchet there), but a live closed-loop
                # press keeps advancing — the cap tracks the pad front at
                # ~0.88 incl. the opening claw (golden t=47-62: cap +67 mm
                # per +77 mm of pad front) and only wedges solid well past
                # that park. An eject at the hold depth froze the cap at
                # 44% travel and the scripted press never reached its
                # success threshold.
                excess_ej = u - (0.050 - depth)
                live_j = faceon & lat_ok & (excess_ej > 0.0) & (u < 0.105) \
                    & (scene.joint_exists > 0)
                jam_push.append(jnp.where(live_j, excess_ej, 0.0))
                # bore-friction ratchet: while the plate is wedged in the
                # cap AND parked, the return spring cannot back the cap
                # out (ref wall trace holds obj at 0.734 for 400 steps
                # against the spring). During the active press (plate
                # advancing) the spring still leaks — the press ratio was
                # calibrated with that resistance in.
                hold = faceon & lat_ok & (excess > -0.005) & (u < 0.105) \
                    & (scene.joint_exists > 0)
                jam_hold.append(hold)
                jam_part = (jnp.zeros_like(dq_p), jnp.full_like(dq_p, _BIG_QV),
                            jnp.full_like(dq_p, -_BIG_QV))
                return dq_p, hi, lo, jam_part
            return dq_p, hi, lo

        # press radii are the claw's FORWARD extents (thin finger plates,
        # ~0.012 m front face at both tip and knuckle heights — golden
        # button traces equilibrate the hand 0.012 from the pressed face),
        # not the fatter clearance spheres used for box blocking
        knuckle_prev = sim.hand + jnp.array([0.0, 0.0, 0.105])
        left_prev, right_prev = pad_kinematics(sim.hand, sim.gripper)
        # the "fingertip at the tcp" is only material when the claw is
        # CLOSED (the tips meet at the center). An open claw is two plates
        # around a void — the reference descends it AROUND a drawer/handle
        # bar to hook it, so a center sphere would wrongly wall off every
        # handle face by r_sum (drawer-open's approach stalled 4 cm out).
        # NB the finger slide ranges bottom out at gap = 0.03 m (r 0.04 +
        # l 0.03 of the 0.1 m opening), so "fully closed" is pad_gap =
        # 0.024, NOT 0: gate against that floor (a 0.025 threshold left the
        # tip 95% disabled in every press pose, and the residual-free
        # side-flipped tip then deadlocked pressed buttons below their
        # face). Fade over the same 2 cm band above the floor.
        pad_gap = gripper * GRIPPER_FULL_OPEN - PAD_GAP_INSET
        tip_active = jnp.clip((0.049 - pad_gap) / 0.02, 0.0, 1.0)
        soft_press = []  # (MAX_JOINT,) flags from disc_yield plate parts
        jam_push = []    # (MAX_JOINT,) hand-eject depths from face-on jams
        jam_hold = []    # (MAX_JOINT,) bore-friction ratchet flags
        parts = [sphere_part(new_hand, sim.hand, 0.012, weight=tip_active)]
        # knuckle: box model against bars, sphere against disc faces (the
        # 0.012 sphere matches the golden button equilibria; the box's disc
        # gate would be too generous 10 cm above the fingers)
        ks = sphere_part(knuckle, knuckle_prev, 0.012)
        kb = box_part(knuckle, knuckle_prev, _KNUCKLE_HALF, bar_only=True)
        parts.append(tuple(jnp.where(has_bar, b, s) for s, b in zip(ks, kb)))
        # the pad PLATES press with their real box extents (ref xyz_base.xml
        # pad boxes, operating pose: x 0.015, y 0.0045, z 0.045): bottom
        # edges lift/press handle bars, the x-z front face pushes side
        # buttons when the claw is open (plates straddle the void the
        # gated tip vacates), and the inner faces catch a drawer bar and
        # drag it (the reference's open-claw drawer hook). Press positions
        # are the UPDATED pads (new hand + new gripper) against the substep
        # start — the approach cap above needs the true pad motion, else a
        # dragging pad reads as static and can only shove at the 0.5 mm
        # settle slack.
        _PLATE_HALF = jnp.array([0.015, 0.0045, 0.045])
        left_press, right_press = pad_kinematics(new_hand, gripper)
        for _pl in (box_part(left_press, left_prev, _PLATE_HALF,
                             disc_yield=True),
                    box_part(right_press, right_prev, _PLATE_HALF,
                             disc_yield=True)):
            parts.append(_pl[:3])
            parts.append(_pl[3])  # face-on jam stop (see disc_yield)
        # the RAIL cross-bar above the hand body (ref xyz_base.xml:158:
        # box half (0.005, 0.055, 0.005) at hand+0.05 = tcp+0.095): wide
        # in y, it is what carries the lever ball through the late lift —
        # the golden lever traces move the handle while it sits ~77 mm in
        # +y of the hand body, beyond every finger part but inside the
        # rail's reach
        # NB the rail geom does NOT collide in the reference (it inherits
        # the xyz_base default contype=0 conaffinity=0, xyz_base_deps:24 —
        # only the claw plates, pads and arm-link meshes collide), so this
        # part is a calibrated proxy for the WRIST/hand MESH (right_hand
        # collision hull, which reaches the same tcp+0.05..0.14 band).
        # It must NOT press horizontally-pressed disc caps: its 0.055
        # y-depth walls the hand 55 mm off every side button the real
        # claw plates reach (golden button-press: ref tcp parks 12.5 mm
        # from the bottomed face; the rail proxy froze it 55 mm out).
        # Everywhere else it stays — the door-lock press (down-diagonal
        # slide) and the lever carry ride on it.
        _RAIL_HALF = jnp.array([0.005, 0.055, 0.005])
        rail_off = jnp.array([0.0, 0.0, 0.095])
        rail_w = 1.0 - (
            (~has_bar)
            & (scene.joint_type == JointType.SLIDE)
            & (jnp.abs(motion[:, 2]) < 0.5)
        ).astype(jnp.float32)
        parts.append(box_part(new_hand + rail_off, sim.hand + rail_off,
                              _RAIL_HALF, weight=rail_w))
        # held tools strike fixture handles too (hammer head -> nail)
        for i in range(pos.shape[0]):
            tool_i = pos[i] + maths.quat_rotate(quat[i], scene.obj_tool_off[i])
            tool_i_prev = sim.obj_pos[i] + maths.quat_rotate(
                sim.obj_quat[i], scene.obj_tool_off[i])
            parts.append(sphere_part(tool_i, tool_i_prev, 0.02,
                                     weight=scene.obj_exists[i]))

        # panel hinges (doors): press contacts act anywhere along the
        # pivot->handle span, sampled at a few stations (each with its own
        # lever radius)
        # the panel plane is the pivot->handle line ROTATED about the pivot
        # by the handle's stick-out: the door handle protrudes 0.12 from
        # the panel face (ref doorlockB.xml:17-21), so the panel point at
        # fraction f of the span sits f*panel_off along +motion off the
        # raw line. Stations on the raw line would wall off the free space
        # the claw crosses to reach the handle (door-open froze there).
        pivot_w = sim.fixture_pos[None, :] + scene.joint_anchor
        panel_shift = scene.joint_panel_off[:, None] * motion
        # CONTINUOUS station: the panel is a solid slab, so each part
        # presses at ITS projection onto the pivot->handle span (fixed
        # fractional stations left ~8 cm dead gaps — the door-close
        # scripted push lands between stations and the door never moved)
        span_p = handle - pivot_w + panel_shift
        span_n2 = jnp.sum(span_p * span_p, axis=1)
        for center, center_prev, r_part in (
            (new_hand, sim.hand, 0.012),
            (knuckle, knuckle_prev, 0.032),
        ):
            fr = jnp.sum((center[None, :] - pivot_w) * span_p, axis=1) \
                / jnp.maximum(span_n2, 1e-9)
            fr = jnp.clip(fr, 0.3, 0.97)
            station = pivot_w + fr[:, None] * span_p
            st_lever = jnp.maximum(lever * fr, 1e-6)
            parts.append(sphere_part(center, center_prev, r_part,
                                     station, st_lever,
                                     weight=scene.joint_panel))

        dq_parts = jnp.stack([p[0] for p in parts])  # (n_parts, MAX_JOINT)
        qv_hi = jnp.min(jnp.stack([p[1] for p in parts]), axis=0)
        qv_lo = jnp.max(jnp.stack([p[2] for p in parts]), axis=0)
        dq = (
            jnp.max(jnp.maximum(dq_parts, 0.0), axis=0)
            + jnp.min(jnp.minimum(dq_parts, 0.0), axis=0)
        )
        # grab suppression: a claw straddling a HOOKABLE handle with the
        # grip closing is wrapping it, not pressing it — the reference claw
        # descends fully around these bars (handle-pull golden traces put
        # the tcp 4 cm below the bar top before lifting), so the press
        # projection and its hand backoff must yield inside the capture
        # volume or the claw can never reach the hook-engagement pose.
        # For HOOK_CARRY joints (the lever ball that only RESTS on the
        # claw) the suppression is additionally gated on the hook-engage
        # hysteresis: once the wrap has slipped (hand parked far off its
        # weld target), the claw is not wrapping — it is a rigid obstacle
        # the ball leans on, and the press must act (golden lever-pull:
        # the slipped ball rides the hand's table-pinned creep for 250
        # steps; suppressing the press froze the lever at the slip
        # instant). True wrap joints (door/faucet/handle bars) keep the
        # unconditional suppression — their claw stays geometrically
        # around the bar even when the weld stretch is large.
        grabbing = (
            (scene.joint_hookable > 0) & in_claw & (effort > 0.0)
            & ((scene.joint_hook_carry == 0)
               | (gap_perp_n < _HOOK_SLIP - 0.03))
        )
        dq = jnp.where(grabbing, 0.0, dq)
        qv_hi = jnp.where(grabbing, _BIG_QV, qv_hi)
        qv_lo = jnp.where(grabbing, -_BIG_QV, qv_lo)
        # rate-cap the contact push (4 handle-m/s) so a deep overlap after
        # a reset or teleport cannot snap the joint in one substep
        dq = jnp.clip(dq, -4.0 * dt / lever, 4.0 * dt / lever)

        # FINITE WELD LOAD: the mocap weld drags the whole arm, and the
        # force it can put on a damped fixture scales with the weld's
        # stretch (golden lever-pull: the tcp trails its weld target by
        # 60-90 mm while the lever turns at ~0.4 m/s against damping 3
        # reflected at a 0.2 m radius; faucet/dial show the same
        # stretch-speed balance at their own c/r^2). Handle-speed budget
        # v = K * |stretch . motion| * lever^2 / c; joints with light
        # reflected damping (buttons, drawers, windows: c/lever^2 <= 30)
        # stay weld-dominated and never bind.
        gap_n = jnp.abs(
            jnp.sum((target - new_hand)[None, :] * motion, axis=1)
        )
        dq_budget = jnp.where(
            scene.joint_damping > 1e-9,
            _WELD_K * gap_n * lever * dt
            / jnp.maximum(scene.joint_damping, 1e-9),
            _BIG_QV,
        ) + 1e-3 * dt  # creep floor: a stalled press still settles
        dq = jnp.clip(dq, -dq_budget, dq_budget)

        # hooked: the grasped handle moves rigidly with the hand at the
        # hook-time offset (rate-capped at 4 m/s so a teleporting target
        # cannot snap the joint; load-capped by the same weld budget, with
        # the truncated motion backing the HAND off below — a hooked lever
        # drags the hand as much as the hand drags the lever). Hinge
        # targets wrap: fixture_inverse is atan2-periodic, so an orbit
        # crossing the +-pi seam must take the short way round, not a
        # 2*pi snap.
        q_target = fixture_inverse(scene, sim.fixture_pos, tcp_mid) + hook_off
        dq_hook = q_target - q
        dq_hook = jnp.where(
            scene.joint_type == JointType.HINGE,
            jnp.mod(dq_hook + jnp.pi, 2.0 * jnp.pi) - jnp.pi,
            dq_hook,
        )
        # carry hooks (lever ball resting on the claw): support transmits
        # lifts (+q) only — descending separates instead of dragging the
        # joint back down
        dq_hook = jnp.where(
            scene.joint_hook_carry > 0, jnp.maximum(dq_hook, 0.0), dq_hook
        )
        hook_cap = jnp.minimum(4.0 * dt, dq_budget)
        q_hooked = q + jnp.clip(dq_hook, -hook_cap, hook_cap)
        q_want = q_free + dq
        q_new = jnp.where(hooked > 0, q_hooked, q_want)
        q_new = jnp.clip(q_new, scene.joint_range[:, 0], scene.joint_range[:, 1])
        # bore-friction ratchet (face-on plate wedged in a horizontal cap):
        # the cap holds against its return spring while jammed
        if jam_hold:
            held = jnp.any(jnp.stack(jam_hold), axis=0) & (hooked == 0)
            q_new = jnp.where(held, jnp.maximum(q_new, q), q_new)
        # a press truncated by a range stop stops the HAND instead: the
        # bottomed-out button/drawer resists with its stop force, and the
        # reference's weld yields (golden traces: the hand equilibrates a
        # finger-width from the pressed face, not at the mocap target).
        # only the PRESS contribution that the stop truncated counts — free
        # dynamics pinned at a range bound (a spring holding a button at
        # rest) is not a hand contact and must not back the hand off
        q_free_clip = jnp.clip(q_free, scene.joint_range[:, 0], scene.joint_range[:, 1])
        dq_realized = jnp.where(hooked > 0, dq, q_new - q_free_clip)
        residual = (dq - dq_realized) * (hooked == 0) * scene.joint_exists
        # hooked back-reaction: the part of the hand's demanded handle
        # motion the load budget (or a range stop) truncated drags the
        # HAND back — a hooked heavy lever slows the arm exactly as much
        # as the arm speeds the lever
        residual = residual + (
            (dq_hook - (q_new - q)) * (hooked > 0) * scene.joint_exists
        )
        backoff = -jnp.sum(
            (residual * lever)[:, None] * motion, axis=0
        )
        # face-on jam ejects the hand directly (mid-travel: no range-stop
        # residual exists, the cap is bore-locked — see box_part disc_yield)
        if jam_push:
            jam_tot = jnp.max(jnp.stack(jam_push), axis=0)
            backoff = backoff - jnp.sum(jam_tot[:, None] * motion, axis=0)
        # the eject may not exceed the hand's own displacement this
        # substep: the press demand carries a 0.5 mm settle slack, and an
        # eject inflated by that slack makes the Coulomb pin below read a
        # phantom normal force every substep — a hand sliding ALONG a
        # stopped door face then freezes in place (u=1 cone: tangential
        # demand <= phantom normal) instead of slipping down to the handle
        bo_raw = _norm(backoff)
        move_pre = _norm(new_hand - sim.hand)
        backoff = backoff * jnp.minimum(1.0, move_pre / jnp.maximum(bo_raw, 1e-9))
        new_hand = new_hand + backoff
        # Coulomb pin against the bottomed-out fixture (same cone as the
        # static-box pin above): while the press is blocked at a range stop,
        # friction holds the fingers laterally on the face
        bo_n = _norm(backoff)
        bo_dir = backoff / jnp.maximum(bo_n, 1e-9)
        dv_b = new_hand - sim.hand
        dv_bn = jnp.dot(dv_b, bo_dir) * bo_dir
        dv_bt = dv_b - dv_bn
        bt_mag = _norm(dv_bt)
        bt_allow = jnp.maximum(bt_mag - _MU_HAND * bo_n, 0.0)
        scale_bt = jnp.where(
            bo_n > 1e-9, bt_allow / jnp.maximum(bt_mag, 1e-9), 1.0
        )
        # round hookable knobs/balls (lever, faucet, dial) shed tangential
        # load — the contact normal on a ball is center-to-part, not the
        # motion axis, so a hand pressing a bottomed-out lever slides off
        # it instead of freezing (golden lever-pull: the ref hand slides
        # down past the parked handle within ~15 steps while its mocap
        # marches on). Flat faces (buttons, doors, drawers) keep the pin.
        pin_round = jnp.any(
            (jnp.abs(residual) > 1e-12) & (scene.joint_hookable > 0)
        )
        scale_bt = jnp.where(pin_round, 1.0, scale_bt)
        # DOME SLIP on VERTICALLY-pressed disc faces (topdown button
        # caps): the fingertip pressing straight down on a round cap
        # slides toward the apex (downhill, free) but cannot be dragged
        # off it (uphill, pinned) — golden button-press-topdown's hand
        # slides from first touch at y 0.854 to the button axis 0.816
        # and parks (a flat-face pin froze it 38 mm off-axis).
        # HORIZONTAL cap presses keep the full Coulomb pin: the weld
        # drives a large normal force into the face and friction clamps
        # every tangential direction (golden button-press: the hand
        # holds both x and z while the mocap drifts 5 cm off).
        disc_live = (
            (jnp.abs(residual) > 1e-12) & ~has_bar
            & (scene.joint_hookable == 0) & (scene.joint_panel == 0)
            & (jnp.abs(motion[:, 2]) > 0.95)
        )
        any_disc = jnp.any(disc_live)
        press_pt_w = handle + press_pt_off
        lat_vec = press_pt_w - new_hand[None, :]
        lat_vec = lat_vec - motion * jnp.sum(
            lat_vec * motion, axis=1, keepdims=True)
        lat_sum = jnp.sum(lat_vec * disc_live[:, None], axis=0)
        lat_n = _norm(lat_sum)
        lat_dir = lat_sum / jnp.maximum(lat_n, 1e-9)
        toward = jnp.dot(dv_bt, lat_dir)
        dv_bt_disc = lat_dir * jnp.clip(toward, 0.0, lat_n)
        dv_bt_eff = jnp.where(any_disc, dv_bt_disc, dv_bt * scale_bt)
        new_hand = sim.hand + dv_bn + dv_bt_eff
        # rigid handle bars: a capsule-bar handle (faucet/window/handle
        # levers) is SOLID perpendicular to its joint's motion axis — the
        # fixture cannot yield there, so the claw must. Push the fingertip
        # sphere radially out of every live bar, with the motion-axis
        # component removed (pressing along motion is the projection's
        # job above). Suppressed while the claw is wrapping or hooked on
        # a hookable handle — the wrap legitimately encloses the bar
        # (golden faucet traces: after release the claw RESTS on the
        # handle arm at bar-radius standoff instead of sinking through).
        def _bar_pushout(center, r_part):
            pt0 = handle + press_pt_off
            s_n = jnp.clip(
                jnp.sum((center[None, :] - pt0) * press_fd, axis=1),
                -scene.joint_face_radius, scene.joint_face_radius,
            )
            pt = pt0 + s_n[:, None] * press_fd
            d3 = center[None, :] - pt
            dist = _norm(d3, axis=1)
            r_sum = scene.joint_handle_radius + r_part
            pen = jnp.maximum(r_sum - dist, 0.0)
            n_dir = d3 / jnp.maximum(dist, 1e-9)[:, None]
            corr = n_dir * pen[:, None]
            corr = corr - motion * jnp.sum(corr * motion, axis=1, keepdims=True)
            wrap = (scene.joint_hookable > 0) & (
                (hooked > 0) | (in_claw & (effort > 0.0))
            )
            act = has_bar & (scene.joint_exists > 0) & ~wrap
            return jnp.sum(corr * act[:, None], axis=0)

        new_hand = new_hand + _bar_pushout(new_hand, _HAND_TIP_R)
        # rigid wrap lock: while hooked, the hand sits at its captured
        # offset from the (possibly rotated) handle in every direction the
        # joint cannot move — the squeezed bar carries the hand there
        q_rot_new = jax.vmap(maths.axis_angle_quat)(scene.joint_axis, q_new)
        off_w_new = jax.vmap(maths.quat_rotate)(q_rot_new, hook_hoff)
        off_w_new = jnp.where(is_hinge_j[:, None], off_w_new, hook_hoff)
        handle_new = fixture_handle_pos(scene, sim.fixture_pos, q_new)
        lock_corr = (handle_new + off_w_new) - new_hand[None, :]
        lock_corr = lock_corr - motion * jnp.sum(
            lock_corr * motion, axis=1, keepdims=True
        )
        # vertical-bar COLLAR: a claw wrapped around a long VERTICAL bar
        # (the door's handle post, ref sawyer_door_pull.xml g49/g50 —
        # vertical cylinders the fingers straddle) is not a rigid pinch.
        # Along the bar axis the fingers slide, with the squeeze carrying
        # most of the weld's vertical sag (golden door-open: the tcp rides
        # at mocap_z - ~12 mm through the pull vs the free-weld settle of
        # -50 mm). Laterally the collar tracks the weld demand but the bar
        # cannot leave the finger footprint: the offset from the bar is the
        # CLAMPED weld demand (cap = the ~30 mm the golden trace holds at
        # full stretch), so excess pull slides the fingers to the footprint
        # edge and parks instead of popping off. Horizontal bars (faucet/
        # handle levers) keep the rigid captured-offset lock — there the
        # finger plates cage the bar top+bottom and carry the hand.
        bar_w = jax.vmap(maths.quat_rotate)(q_rot_new, scene.joint_face_dir)
        slide_bar = collar_j & has_bar
        _COLLAR_CAP = 0.030
        off_tgt = target[None, :] - handle_new
        off_lat = (
            off_tgt
            - motion * jnp.sum(off_tgt * motion, axis=1, keepdims=True)
            - bar_w * jnp.sum(off_tgt * bar_w, axis=1, keepdims=True)
        )
        lat_n = _norm(off_lat, axis=1)
        off_lat = off_lat * jnp.minimum(
            1.0, _COLLAR_CAP / jnp.maximum(lat_n, 1e-9)
        )[:, None]
        collar_corr = (handle_new + off_lat) - new_hand[None, :]
        collar_corr = (
            collar_corr
            - motion * jnp.sum(collar_corr * motion, axis=1, keepdims=True)
            - bar_w * jnp.sum(collar_corr * bar_w, axis=1, keepdims=True)
        )
        bar_des = target - TCP_OFFSET + jnp.array([0.0, 0.0, -0.012])
        err_bar = jnp.sum((bar_des[None, :] - new_hand[None, :]) * bar_w,
                          axis=1)
        k_bar = 1.0 - jnp.exp(-dt / 0.05)
        lock_corr = jnp.where(
            slide_bar[:, None],
            collar_corr + bar_w * (err_bar * k_bar)[:, None],
            lock_corr,
        )
        new_hand = new_hand + jnp.sum(
            lock_corr * (hooked > 0)[:, None], axis=0
        )
        # knob-bar support (dial): the claw PARKS resting on the rotating
        # pointer bar's top face (golden dial-turn: post-crank tcp z
        # 0.066 = the live model's knob box top — half (0.015, 0.046,
        # 0.015) at dial+(0,0,0.051), rotating about z). Frictionless and
        # catch-from-above only: the crank sweep (ref tcp dips 21 mm
        # BELOW the bar top while pushing the pin's side, golden t~50)
        # must stay untouched, which is why this is not a blocks_hand box
        # (a kinematic pushout there broke the scripted crank).
        knob_j = (
            is_hinge_j & (jnp.abs(scene.joint_axis[:, 2]) > 0.9)
            & (scene.joint_hookable == 0) & (scene.joint_panel == 0)
            & (scene.joint_handle_radius > 1e-6) & (scene.joint_exists > 0)
        )
        knob_pivot = sim.fixture_pos[None, :] + scene.joint_anchor
        knob_dir = handle_new[:, :2] - knob_pivot[:, :2]
        knob_dir = knob_dir / jnp.maximum(
            _norm(knob_dir, axis=1), 1e-9)[:, None]
        knob_top = (knob_pivot[:, 2] + jnp.abs(scene.joint_arm[:, 2])
                    - 0.004)
        lpad_k, rpad_k = pad_kinematics(new_hand, gripper)
        knob_catch = jnp.zeros((), dtype=bool)
        knob_z = jnp.full((), -jnp.inf)
        for pk in (lpad_k, rpad_k, new_hand):
            rel_k = pk[None, :2] - knob_pivot[:, :2]
            proj_k = jnp.sum(rel_k * knob_dir, axis=1)
            perp_k = rel_k - proj_k[:, None] * knob_dir
            over_k = (jnp.abs(proj_k) <= 0.061) & (_norm(perp_k, axis=1)
                                                   <= 0.025)
            c = knob_j & over_k & (sim.hand[2] >= knob_top - 0.005)
            knob_catch = knob_catch | jnp.any(c)
            knob_z = jnp.maximum(knob_z, jnp.max(jnp.where(c, knob_top,
                                                           -jnp.inf)))
        new_hand = jnp.where(
            knob_catch,
            jnp.concatenate([new_hand[:2],
                             jnp.maximum(new_hand[2], knob_z)[None]]),
            new_hand,
        )
        # table support under the claw: the reference's fingertip geoms
        # bottom out on the table (or pit floor) at tcp ~ support - 0.01
        # (golden-trace tcp minima: -0.009..+0.002 across the solid-table
        # scenes) — without this the open-loop hand dives through the
        # table whenever the recorded policy keeps pressing down. The
        # contact carries a Coulomb stick/slip pin (same cone as the
        # static-box pin above): when the weld drives the mocap BELOW the
        # surface, the blocked normal demand loads the fingertips and
        # friction holds them laterally — golden lever-pull parks the tcp
        # at the lever (creeping ~0.5 mm/control step) while the mocap
        # retreats 0.4 m at z = -0.15; hand-insert freezes the hand in the
        # pit the same way. Press-and-DRAG tasks are untouched: their
        # mocap stays 30-50 mm ABOVE the tcp (sweep/push/dial golden
        # traces), so the support never blocks motion and the pin's
        # normal demand is zero.
        tbl = _support_z(scene, new_hand[:2]) - 0.010
        blocked_z = jnp.maximum(tbl - new_hand[2], 0.0)
        dv_sx = new_hand[:2] - sim.hand[:2]
        t_mag_s = _norm(dv_sx)
        t_allow_s = jnp.maximum(t_mag_s - _MU_TABLE * blocked_z, 0.0)
        scale_s = jnp.where(blocked_z > 1e-9,
                            t_allow_s / jnp.maximum(t_mag_s, 1e-9), 1.0)
        new_hand = jnp.concatenate([
            sim.hand[:2] + dv_sx * scale_s,
            (new_hand[2] + blocked_z)[None],
        ])
        hand_vel = (new_hand - sim.hand) / dt
        qv = (q_new - q) / dt
        # inelastic press contacts: a COASTING fixture that catches a live
        # contact part decelerates to the part's speed (see _vel_bounds).
        # DISSIPATIVE ONLY — the bound applies only when it reduces |qv|:
        # letting it also accelerate would velocity-match the fixture to an
        # approaching hand at full hand speed, bypassing the move-capped
        # positional projection (an approach graze then slams a swung-open
        # door shut). Pushing stays the projection's job.
        cand = jnp.clip(qv, qv_lo, qv_hi)
        qv_press = jnp.where(jnp.abs(cand) <= jnp.abs(qv) + 1e-9, cand, qv)
        qv = jnp.where(hooked > 0, qv, qv_press)
        q_new = q_new * scene.joint_exists
        qv = qv * scene.joint_exists

        # finger yield under a soft plate press: the reference's finger
        # joints (armature 100, damping 1000, position servo toward ctrl 0)
        # COMPRESS while a plate is jammed against a bottomed cap — the
        # pressed finger is shoved back and the aperture obs drops to a
        # loaded plateau ~0.70 (golden button-press 0.998->0.70 over ~25
        # steps then holds; coffee-button parks at 0.696 for the rest of
        # the episode; button-press-wall dips then RECOVERS to ~0.93 once
        # the press releases — the finger ODE's own servo reopening).
        # Model: while any disc_yield plate is blocked at the stop, the
        # aperture tracks the loaded plateau; on release the unmodified
        # finger ODE springs back (tau = damp/kp ~ 40 steps, as the wall
        # trace shows).
        # ... gated on the weld stretch along the press axis: a HARD press
        # (mocap marching past the jammed hand) compresses the finger to
        # the ~0.70 plateau (button-press stretch 0.26, coffee-button);
        # a light hold (wall trace: mocap parks, aperture rides at 0.93)
        # leaves the servo in charge.
        soft_any_j = (jnp.any(jnp.stack(soft_press), axis=0)
                      if soft_press else jnp.zeros_like(gap_n, dtype=bool))
        soft_any = jnp.any(soft_any_j & (gap_n > 0.06))
        _APERTURE_LOADED = 0.696
        # while loaded the cap is authoritative (the servo cannot reopen
        # against the jam): ratchet down from the SUBSTEP-START aperture
        loaded_cap = jnp.maximum(sim.gripper - 0.0025, _APERTURE_LOADED)
        gripper = jnp.where(
            soft_any, jnp.minimum(gripper, loaded_cap), gripper,
        )

        # pad forces for touching_object (ref sawyer_xyz_env.py:401-440:
        # per-pad sums of efc_force on pad-object contacts). Two sources,
        # per pad and distinct: (a) push contact — proportional to the
        # actual pad-vs-main-object penetration resolved above (a one-pad
        # graze yields a one-pad force, as in the reference); (b) grip —
        # a caged, squeezed object loads BOTH pads with the remaining
        # actuator drive.
        _PAD_K = 4000.0  # penetration -> force scale (position-actuator kp x10)
        gripped0 = ((attached[0] > 0) | can_grasp[0]) & (squeeze > 0.0)
        pad_f_l = _PAD_K * pad_push_depth[0][0] + jnp.where(gripped0, squeeze, 0.0)
        pad_f_r = _PAD_K * pad_push_depth[1][0] + jnp.where(gripped0, squeeze, 0.0)
        pad_l_new, pad_r_new = pad_kinematics(new_hand, gripper)

        new_sim = sim.replace(
            hand=new_hand,
            hand_vel=hand_vel,
            gripper=gripper,
            gripper_vel=gripper_vel,
            obj_pos=pos,
            obj_vel=vel,
            obj_quat=quat,
            obj_angvel=omega,
            joint_q=q_new,
            joint_v=qv,
            attached=attached,
            attach_off=attach_off,
            unanchored=unanchored,
            hooked=hooked,
            hook_off=hook_off,
            hook_hoff=hook_hoff,
            pad_force_l=pad_f_l,
            pad_force_r=pad_f_r,
            pad_l=pad_l_new,
            pad_r=pad_r_new,
        )
        return new_sim, None

    # NB: unrolling this scan (unroll=FRAME_SKIP) looks attractive but
    # explodes XLA compile time on TPU (minutes instead of seconds) for a
    # negligible steady-state gain — the scan body is already one fused
    # kernel per substep
    sim, _ = jax.lax.scan(substep, sim, None, length=FRAME_SKIP)
    return sim


def fixture_handle_pos(scene: SceneParams, fixture_pos, joint_q):
    """World position of each fixture handle as a function of its joint
    coordinate (slide: anchor + axis*q; hinge: pivot + R(axis, q) @ arm)."""
    anchor = fixture_pos[None, :] + scene.joint_anchor
    slide = anchor + scene.joint_axis * joint_q[:, None]
    quat = jax.vmap(maths.axis_angle_quat)(scene.joint_axis, joint_q)
    arm = jax.vmap(maths.quat_rotate)(quat, scene.joint_arm)
    hinge = anchor + arm
    is_hinge = (scene.joint_type == JointType.HINGE)[:, None]
    return jnp.where(is_hinge, hinge, slide)


def fixture_motion_dir(scene: SceneParams, fixture_pos, joint_q):
    """Unit direction the handle moves for +dq (tangent for hinges)."""
    quat = jax.vmap(maths.axis_angle_quat)(scene.joint_axis, joint_q)
    arm = jax.vmap(maths.quat_rotate)(quat, scene.joint_arm)
    tangent = jnp.cross(scene.joint_axis, arm)
    tangent = maths.safe_normalize(tangent)
    is_hinge = (scene.joint_type == JointType.HINGE)[:, None]
    return jnp.where(is_hinge, tangent, maths.safe_normalize(scene.joint_axis))


def fixture_inverse(scene: SceneParams, fixture_pos, point):
    """Joint coordinate that brings the handle closest to `point`.

    Slide: projection on the axis. Hinge: atan2 in the plane normal to the
    axis."""
    anchor = fixture_pos[None, :] + scene.joint_anchor
    rel = point[None, :] - anchor
    q_slide = jnp.sum(rel * scene.joint_axis, axis=1)
    # hinge: angle from arm to rel, both projected normal to axis
    axis = scene.joint_axis
    arm0 = scene.joint_arm
    rel_p = rel - jnp.sum(rel * axis, axis=1, keepdims=True) * axis
    arm_p = arm0 - jnp.sum(arm0 * axis, axis=1, keepdims=True) * axis
    cosq = jnp.sum(rel_p * arm_p, axis=1)
    sinq = jnp.sum(jnp.cross(arm_p, rel_p) * axis, axis=1)
    q_hinge = jnp.arctan2(sinq, jnp.where((jnp.abs(sinq) + jnp.abs(cosq)) < 1e-12, 1.0, cosq))
    return jnp.where(scene.joint_type == JointType.HINGE, q_hinge, q_slide)


def settled_hand_state(scene: SceneParams, hand_init: jnp.ndarray):
    """Hand/gripper state after the reference's 50-step mocap servo reset
    (ref sawyer_xyz_env.py:684-695) — computed analytically: the weld has
    fully converged, the gripper is fully open (ctrl [-1, 1])."""
    mocap = jnp.clip(hand_init, scene.mocap_low, scene.mocap_high)
    tcp = mocap + TCP_OFFSET
    return mocap, tcp
