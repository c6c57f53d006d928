"""Core pytree types for the TPU-native Meta-World.

Design: the reference keeps 50 stateful classes each owning a C MuJoCo
instance (ref metaworld/sawyer_xyz_env.py:143). Here the entire environment is
two pytrees — a static, per-task `SceneParams` row (stacked into tables and
gathered by task id, so a *single* compiled step serves all 50 tasks under
vmap) and a dynamic `EnvState` carrying everything that changes per step or
per reset. Checkpointing is therefore trivial: serialize the pytree.

Dimensional conventions (uniform across all 50 tasks so MT50 is one vmap):
  * up to MAX_OBJ   = 2 dynamic free bodies   (ref two-object envs, SURVEY §2.2)
  * up to MAX_JOINT = 2 articulated fixture dofs (hinge/slide at qpos[9], ref
    sawyer_xyz_env.py:351-361 and the fixture envs)
  * up to MAX_STATIC = 6 static collision boxes per scene (walls, bins, pegs)
  * observation is 39-dim: [curr18 | prev18 | goal3] (ref sawyer_xyz_env.py:513-527)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

MAX_OBJ = 2
MAX_JOINT = 2
MAX_STATIC = 6
MAX_RAND = 12     # widest task rand_vec, padded
N_EXTRAS = 12     # task-specific reset-time reward margins
OBS_DIM = 39
ACT_DIM = 4

# Physics constants shared by every scene (ref assets/scene/basic_scene.xml:2,
# sawyer_xyz_env.py:153,176)
SIM_DT = 0.0025
FRAME_SKIP = 5
CTRL_DT = SIM_DT * FRAME_SKIP
MAX_PATH_LENGTH = 500
TARGET_RADIUS = 0.05

# Hand / mocap bounds (ref sawyer_xyz_env.py:146-150, 28-29)
HAND_SPACE_LOW = (-0.525, 0.348, -0.0525)
HAND_SPACE_HIGH = (0.525, 1.025, 0.7)
ACTION_SCALE = 1.0 / 100

# Gripper geometry (ref objects/assets/xyz_base.xml:159-183): pads are boxes of
# half-size (0.045, 0.003, 0.015) opening along y; fingers are ~0.1 m apart
# when open and the aperture observation is ||left-right||/0.1 clipped to [0,1]
# (ref sawyer_xyz_env.py:497-498).
PAD_HALF_SIZE = (0.045, 0.003, 0.015)
GRIPPER_FULL_OPEN = 0.1

TABLE_Z = 0.0  # table top surface height (basic_scene.xml:41)


class ObjType:
    """Dynamic free-body collision archetypes (static per task)."""

    NONE = 0
    CYLINDER = 1   # pucks, mugs (flat objects; quat mostly identity)
    SPHERE = 2     # soccer ball, basketball
    BOX = 3        # blocks, lids, tools


class JointType:
    """Articulated fixture joints (static per task)."""

    NONE = 0
    SLIDE = 1
    HINGE = 2


@struct.dataclass
class SceneParams:
    """Static per-task physics parameters. Every field is an array so the 50
    tasks stack into tables and a batched step gathers rows by task id."""

    # --- dynamic free bodies ---
    obj_exists: jnp.ndarray      # (MAX_OBJ,) 0/1
    obj_type: jnp.ndarray        # (MAX_OBJ,) ObjType
    obj_radius: jnp.ndarray      # (MAX_OBJ,) horizontal contact radius
    obj_half_x: jnp.ndarray      # (MAX_OBJ,) x half-extent for the pad-contact
                                 # AABB (rods like the stick are long along x;
                                 # resolved to radius at build time when equal)
    obj_oo_half_x: jnp.ndarray   # (MAX_OBJ,) x half-extent for OBJECT-OBJECT
                                 # contact (the stick-push container's handle
                                 # rod reaches 0.107 m from the COM — far
                                 # outside its pad-contact body; resolved to
                                 # obj_half_x at build time when unset)
    obj_grasp_x_tol: jnp.ndarray  # (MAX_OBJ,) max |x| grasp-point offset for
                                 # a stable cage (tapered mugs eject when
                                 # pinched off-diameter; see scene_builder)
    obj_half_h: jnp.ndarray      # (MAX_OBJ,) COM height above support when resting
    obj_mass: jnp.ndarray        # (MAX_OBJ,)
    obj_graspable: jnp.ndarray   # (MAX_OBJ,) 0/1 — can be caged by the pads
    obj_grasp_halfwidth: jnp.ndarray  # (MAX_OBJ,) y half-width the pads clamp onto
    obj_anchored: jnp.ndarray    # (MAX_OBJ,) 0/1 — held in place (socketed plug)
                                 # until first grasped
    obj_tool_off: jnp.ndarray    # (MAX_OBJ, 3) tool point rel. COM (hammer head,
                                 # stick tip) — contacts fixture handles and drives
                                 # the object-object link; world frame AT RESET,
                                 # rotated by the live delta quat each step
    obj_droop: jnp.ndarray       # (MAX_OBJ,) equilibrium in-grip pitch about the
                                 # pad axis (rad): gravity torque on an off-center
                                 # grasp vs pad torsional compliance (0 = rigid
                                 # grip; calibrated per task against reference
                                 # body-quat traces)
    obj_grasp_off: jnp.ndarray   # (MAX_OBJ, 3) grasp point rel. COM (wrench/hammer
                                 # handles, lid knob)
    obj_planar: jnp.ndarray      # (MAX_OBJ,) 0/1 — body is 2-dof slide-jointed in
                                 # the reference (plate-slide puck, stick thermos):
                                 # no free joint, no lift, viscous joint damping
                                 # instead of Coulomb ground friction
    obj_lin_damping: jnp.ndarray # (MAX_OBJ,) planar slide joint damping (N·s/m)
    obj_friction: jnp.ndarray    # (MAX_OBJ,) sliding Coulomb coefficient on the
                                 # support (MuJoCo default 1.0; most of our
                                 # pucks calibrate at 0.55)
    obj_xy_limited: jnp.ndarray  # (MAX_OBJ,) 0/1 — body sits on limited slide
                                 # joints (soft range springs, not free)
    obj_xy_lo: jnp.ndarray       # (MAX_OBJ, 2) world xy lower slide stops
    obj_xy_hi: jnp.ndarray       # (MAX_OBJ, 2) world xy upper slide stops
    obj_hook_grasp: jnp.ndarray  # (MAX_OBJ,) 0/1 — plug-cap hook: attaches when
                                 # caged with the grip driving closed, without
                                 # squeeze contact (peg-unplug's mushroom cap)
    link_enable: jnp.ndarray     # () 0/1 — obj0's tool point can hook obj1
    link_handle_off: jnp.ndarray # (3,) hook point rel. obj1 COM

    # --- articulated fixture joints (handle kinematics: q -> handle pos) ---
    joint_exists: jnp.ndarray    # (MAX_JOINT,) 0/1
    joint_type: jnp.ndarray      # (MAX_JOINT,) JointType
    joint_axis: jnp.ndarray      # (MAX_JOINT, 3) slide direction / hinge axis
    joint_anchor: jnp.ndarray    # (MAX_JOINT, 3) handle rest pos (slide) or pivot (hinge), rel. fixture base
    joint_arm: jnp.ndarray       # (MAX_JOINT, 3) hinge: handle offset from pivot at q=0
    joint_range: jnp.ndarray     # (MAX_JOINT, 2) (lo, hi)
    joint_damping: jnp.ndarray   # (MAX_JOINT,)
    joint_stiffness: jnp.ndarray # (MAX_JOINT,) spring toward joint_springref
    joint_springref: jnp.ndarray # (MAX_JOINT,)
    joint_inertia: jnp.ndarray   # (MAX_JOINT,) generalized inertia M[dof,dof]
                                 # (compiled-model mass matrix diag, incl. armature)
    joint_bias: jnp.ndarray      # (MAX_JOINT,) constant generalized force (extra
                                 # actuator bias; gravity is computed from mass/com)
    joint_mass: jnp.ndarray      # (MAX_JOINT,) subtree mass (kg) for gravity
    joint_com: jnp.ndarray       # (MAX_JOINT, 3) subtree COM rel. anchor at q=0
    joint_handle_radius: jnp.ndarray  # (MAX_JOINT,) contact radius of the handle
                                 # along the motion axis (press-face half depth)
    joint_face_radius: jnp.ndarray  # (MAX_JOINT,) lateral press-face radius
                                 # perpendicular to the motion axis (button caps
                                 # are wide discs: r=0.0425 vs a 0.02 knob)
    joint_press_off: jnp.ndarray # (MAX_JOINT, 3) press-face center offset from
                                 # the handle/obs point (the reported body com is
                                 # not the contact face, e.g. topdown buttons)
    joint_face_dir: jnp.ndarray  # (MAX_JOINT, 3) handle BAR axis (unit, rotates
                                 # with the joint). Zero -> the press face is an
                                 # isotropic disc; set -> a capsule of radius
                                 # joint_handle_radius and half-length
                                 # joint_face_radius along this axis (handle
                                 # levers, drawer handles)
    joint_hook_carry: jnp.ndarray # (MAX_JOINT,) 0/1 — hook is a one-way CARRY
                                 # (handle rests on the claw): transmits +q
                                 # lifts only
    joint_hookable: jnp.ndarray  # (MAX_JOINT,) 0/1 — gripper can close around handle and pull
    joint_panel_off: jnp.ndarray # (MAX_JOINT,) panel plane offset from the
                                 # pivot->handle line along +motion (the door
                                 # handle sticks 0.12 out from the panel, ref
                                 # doorlockB.xml:17-21)
    joint_panel: jnp.ndarray     # (MAX_JOINT,) 0/1 — hinge carries a panel: press
                                 # contacts act along the pivot->handle span (doors)

    # --- static collision boxes (walls, bins, shelves), rel. fixture base when flagged ---
    static_exists: jnp.ndarray   # (MAX_STATIC,) 0/1
    static_pos: jnp.ndarray      # (MAX_STATIC, 3) box center
    static_size: jnp.ndarray     # (MAX_STATIC, 3) half sizes
    static_rel: jnp.ndarray      # (MAX_STATIC,) 0/1 — positioned relative to fixture base
    static_blocks_hand: jnp.ndarray  # (MAX_STATIC,) 0/1 — the hand collides
                                 # with this box (the reference arm is blocked
                                 # by fixture bodies; boxes transcribed only
                                 # for object contacts can opt out)

    # --- table topology (holes / pits: table_with_hole, pick_out_of_hole) ---
    hole_center: jnp.ndarray     # (2,) xy
    hole_halfsize: jnp.ndarray   # (2,) xy half extent, 0 = no hole
    pit_depth: jnp.ndarray       # () support z inside the hole = table_z - pit_depth
    table_z: jnp.ndarray         # () support surface height (basic_scene_b's
                                 # tabletop sits at +0.05, not 0 — ref
                                 # assets/scene/basic_scene_b.xml:33-37)

    # --- mocap clamp (per-task hand_low/high, ref env __init__ kwargs) ---
    mocap_low: jnp.ndarray       # (3,)
    mocap_high: jnp.ndarray      # (3,)


@struct.dataclass
class SimState:
    """Dynamic physics state (per env instance)."""

    mocap: jnp.ndarray        # (3,) commanded mocap position
    hand: jnp.ndarray         # (3,) tcp center (mean of finger sites)
    hand_vel: jnp.ndarray     # (3,)
    gripper: jnp.ndarray      # () normalized aperture in [0, 1] (pad gap / 0.1)
    gripper_vel: jnp.ndarray  # ()
    obj_pos: jnp.ndarray      # (MAX_OBJ, 3)
    obj_quat: jnp.ndarray     # (MAX_OBJ, 4) wxyz DELTA rotation from the reset
                              # orientation (identity at reset); absolute body
                              # orientation = obj_quat x task reset quat
    obj_vel: jnp.ndarray      # (MAX_OBJ, 3)
    obj_angvel: jnp.ndarray   # (MAX_OBJ, 3) world-frame angular velocity
    joint_q: jnp.ndarray      # (MAX_JOINT,)
    joint_v: jnp.ndarray      # (MAX_JOINT,)
    attached: jnp.ndarray     # (MAX_OBJ,) 0/1 — object welded to the hand (grasped)
    attach_off: jnp.ndarray   # (MAX_OBJ, 3) object offset from hand while attached
    unanchored: jnp.ndarray   # (MAX_OBJ,) 0/1 latch — anchored object freed by
                              # its first grasp
    hooked: jnp.ndarray       # (MAX_JOINT,) 0/1 — gripper hooked on fixture handle
    hook_off: jnp.ndarray     # (MAX_JOINT,) joint-coordinate offset captured at
                              # hook engagement (q - fixture_inverse(claw)); the
                              # hooked joint follows the claw WITH this offset,
                              # so engaging never teleports the handle
    hook_hoff: jnp.ndarray    # (MAX_JOINT, 3) hand offset from the handle point
                              # at hook engagement, in the JOINT frame — the
                              # squeezed wrap is rigid perpendicular to the
                              # joint's motion, so the hand is locked to
                              # handle + R(q) . hook_hoff there while hooked
    pad_force_l: jnp.ndarray  # () left pad normal force on main object
    pad_force_r: jnp.ndarray  # () right pad normal force on main object
    pad_l: jnp.ndarray        # (3,) left pad box center (world) — real state so
    pad_r: jnp.ndarray        # (3,) rewards read the same pads the engine used
                              # (and replay harnesses can inject recorded pads)
    fixture_pos: jnp.ndarray  # (3,) per-reset fixture base position (ref mutates
                              # model.body(...).pos at reset; here it is state)


@struct.dataclass
class EnvState:
    """Full per-env state: sim + episode bookkeeping + reset-time constants."""

    sim: SimState
    prev_obs: jnp.ndarray       # (18,) previous frame for obs stacking
    target: jnp.ndarray         # (3,) goal position
    hand_init: jnp.ndarray      # (3,)
    init_tcp: jnp.ndarray       # (3,) tcp after hand reset
    init_left_pad: jnp.ndarray  # (3,)
    init_right_pad: jnp.ndarray # (3,)
    obj_init_pos: jnp.ndarray   # (MAX_OBJ, 3)
    extras: jnp.ndarray         # (N_EXTRAS,) task-specific reward margins
    rand_vec: jnp.ndarray       # (MAX_RAND,) the sampled task vector, padded
    path_length: jnp.ndarray    # () int32
    rng: jnp.ndarray            # PRNG key
    task_id: jnp.ndarray        # () int32 index into the task registry
    goal_visible: jnp.ndarray   # () 1.0 = MT (goal observable), 0.0 = ML (hidden)


@struct.dataclass
class StepOut:
    """Everything a control step emits (struct-of-arrays under vmap)."""

    obs: jnp.ndarray            # (39,)
    reward: jnp.ndarray         # ()
    terminated: jnp.ndarray     # () bool — always False in the base env
    truncated: jnp.ndarray      # () bool — path_length == 500
    success: jnp.ndarray        # ()
    near_object: jnp.ndarray    # ()
    grasp_success: jnp.ndarray  # ()
    grasp_reward: jnp.ndarray   # ()
    in_place_reward: jnp.ndarray  # ()
    obj_to_target: jnp.ndarray  # ()
    unscaled_reward: jnp.ndarray  # ()


def info_dict(out: StepOut) -> dict:
    """The reference's per-step info schema (ref sawyer_xyz_env.py:610-618)."""
    return {
        "success": out.success,
        "near_object": out.near_object,
        "grasp_success": out.grasp_success,
        "grasp_reward": out.grasp_reward,
        "in_place_reward": out.in_place_reward,
        "obj_to_target": out.obj_to_target,
        "unscaled_reward": out.unscaled_reward,
    }
