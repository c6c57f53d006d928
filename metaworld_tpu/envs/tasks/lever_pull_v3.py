"""lever-pull-v3: lift the lever 90 degrees to vertical.

Ref metaworld/envs/sawyer_lever_pull_v3.py: lever body at rand (x in
[-0.1,0.1], y in [0.7,0.8], 0); pivot at body + (0.12, 0, 0.25), arm
(0,-0.2,0) (LEVER_RADIUS 0.2); target = body + (0.12, 0, 0.45); v2 reward
(:116-180): shoulder-offset readiness + hinge-angle engagement; success
lever_error <= pi/24.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FixtureJoint, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_PIVOT = (0.12, 0.0, 0.25)
_ARM = (0.0, -0.2, 0.0)


def _reset(spec: TaskSpec, rand, rng):
    body = rand[:3]
    lever0 = body + jnp.asarray(_PIVOT) + jnp.asarray(_ARM)
    target = body + jnp.array([0.12, 0.0, 0.45])
    return dict(
        fixture_pos=body,
        target=target,
        obj_init_pos=common.pad_obj_pos(lever0),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    return handle, common.live_quat(spec, state)


def _reward(spec: TaskSpec, state, obs, action):
    gripper = obs[:3]
    lever = obs[4:7]
    scale = jnp.array([4.0, 1.0, 4.0])
    offset = jnp.array([0.0, 0.055, 0.07])
    shoulder_to_lever = (gripper + offset - lever) * scale
    shoulder_to_lever_init = (state.init_tcp + offset - state.obj_init_pos[0]) * scale
    ready_to_lift = reward_utils.tolerance(
        jnp.linalg.norm(shoulder_to_lever),
        bounds=(0, 0.02),
        margin=jnp.linalg.norm(shoulder_to_lever_init),
        sigmoid="long_tail",
    )
    # lever angle: our hinge q runs 0 (horizontal) .. pi/2 (vertical up)
    lever_angle = state.sim.joint_q[0]
    lever_error = jnp.abs(lever_angle - jnp.pi / 2.0)
    lever_engagement = reward_utils.tolerance(
        lever_error, bounds=(0, jnp.pi / 48.0),
        margin=(jnp.pi / 2.0) - (jnp.pi / 12.0), sigmoid="long_tail",
    )
    target = state.target
    obj_to_target = jnp.linalg.norm(lever - target)
    in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.04), margin=in_place_margin,
        sigmoid="long_tail",
    )
    reward = 10.0 * reward_utils.hamacher_product(ready_to_lift, in_place)
    return common.eval_out(
        reward=reward,
        success=(lever_error <= jnp.pi / 24).astype(jnp.float32),
        near_object=(jnp.linalg.norm(shoulder_to_lever) < 0.03
                     ).astype(jnp.float32),
        grasp_success=(ready_to_lift > 0.9).astype(jnp.float32),
        grasp_reward=ready_to_lift,
        in_place_reward=lever_engagement,
        obj_to_target=jnp.linalg.norm(shoulder_to_lever),
    )


@registry.register("lever-pull-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        boxes=[
            StaticBox(pos=(0.0, 0.0, 0.125), size=(0.041, 0.083, 0.125),
                      rel_fixture=True),
            StaticBox(pos=(0.0, 0.0, 0.25), size=(0.041, 0.083, 0.083),
                      rel_fixture=True),
        ],
        joints=[FixtureJoint(
            kind=JointType.HINGE, axis=(-1.0, 0.0, 0.0), anchor=_PIVOT, arm=_ARM,
            # compiled truth (scripts/compiled_truth.py, LeverAxis):
            # M+armature 0.002, damping 2.0, subtree mass 0.004 — a feather
            # on a damper. The declared MJCF limit [0, 1.57] YIELDS to the
            # weld in the reference (golden trace: the recorded handle
            # sweeps to q ~ 3.1 under the hand, is pushed past the top,
            # and ends parked at q ~ 5.2 below the far side of the pivot),
            # so the model range here is the PHYSICAL travel, with the
            # hard lower stop the lever rests on.
            range=(0.0, 5.9), damping=2.0, inertia=0.002,
            mass=0.004, com=(-0.006, -0.073, 0.0),
            # the ball (objGeom r ~0.03) rides the claw/rail assembly; the
            # hook models that carry (with the engine's descent gate so a
            # re-approaching hand falling onto the ball does not wrap it)
            handle_radius=0.045, hookable=True, hook_carry=True,
        )],
        # ref hand_low z = -0.15 (sawyer_lever_pull_v3.py:42): the scripted
        # retreat drives the mocap 0.15 m below the table and the pressed
        # fingertips Coulomb-pin the tcp at the lever
        mocap_low=(-0.5, 0.40, -0.15),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="lever-pull-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([-0.1, 0.7, 0.0]),
        rand_high=np.array([0.1, 0.8, 0.0]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, 0.05)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # lever geom xmat -> scipy xyzw (ref sawyer_lever_pull_v3.py:
        # _get_quat_objects); rotates with the hinge about -x
        obj_quat0=np.array([[0.707107, 0.707107, 0.0, 0.0],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("xyzw", "xyzw"),
        quat_joint=(0, -1),
        n_obs_obj=1,
    )
