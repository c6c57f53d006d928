"""door-close-v3: push the open door shut.

Ref metaworld/envs/sawyer_door_close_v3.py: door at rand (x in [0,0.1],
y in [0.85,0.95], 0.15), starts open; target = door_rand + (0.2,-0.2,0);
v2 reward (:120-152): gaussian in_place + hand_in_place; success
|handle - target| <= 0.08.

Hinge geometry from the compiled reference model (doorlockB.xml: door_link
at door + (-0.185, -0.1, 0), hinge axis z, range [-2, 0]; "handle" geom
compiled local pos (0.3757, -0.1071, 0) after MuJoCo's mesh recentering).
Our joint coordinate measures CLOSING from the open pose:
q_close = q_mujoco + pi/2, so the reset (door open, q_mujoco = -1.5708,
ref reset_model :95) sits at q_close = 0 and the arm below is the true
arm rotated by R(z, -pi/2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FixtureJoint, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_PIVOT = (-0.185, -0.1, 0.0)
_ARM = (-0.10714, -0.375722, 0.0)  # R(z, -pi/2) @ (0.375722, -0.10714, 0)


def _reset(spec: TaskSpec, rand, rng):
    door = rand[:3]
    target = door + jnp.array([0.2, -0.2, 0.0])
    # reference obj_init_pos is the DOOR BODY (rand vec) — its in_place
    # margin |obj_init - target| is body-based even though the obs tracks
    # the handle (sawyer_door_close_v3.py reset_model)
    return dict(
        fixture_pos=door,
        target=target,
        obj_init_pos=common.pad_obj_pos(door),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    return handle, common.live_quat(spec, state)


def _reward(spec: TaskSpec, state, obs, action):
    target_radius = 0.05
    tcp = state.sim.hand
    obj = obs[4:7]
    target = state.target
    tcp_to_target = jnp.linalg.norm(tcp - target)
    obj_to_target = jnp.linalg.norm(obj - target)
    in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, target_radius), margin=in_place_margin,
        sigmoid="gaussian",
    )
    hand_margin = jnp.linalg.norm(state.hand_init - obj) + 0.1
    hand_in_place = reward_utils.tolerance(
        tcp_to_target, bounds=(0, 0.25 * target_radius), margin=hand_margin,
        sigmoid="gaussian",
    )
    reward = 3.0 * hand_in_place + 6.0 * in_place
    reward = jnp.where(obj_to_target < target_radius, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.08).astype(jnp.float32),
        near_object=0.0,
        grasp_success=1.0,
        grasp_reward=1.0,
        in_place_reward=in_place,
        obj_to_target=obj_to_target,
    )


@registry.register("door-close-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            kind=JointType.HINGE, axis=(0.0, 0.0, 1.0), anchor=_PIVOT, arm=_ARM,
            # compiled truth (sawyer_door_pull.xml doorjoint): M=0.151,
            # damping=2.0, subtree mass 2.23 (z-hinge: no gravity torque);
            # capsule handle bar as in door-open (phantom-press fix)
            # open stop: door slab vs doorlockB housing at q_mujoco -1.785
            # (see door_open_v3), i.e. q_close -0.214
            range=(-0.214, 1.5708), damping=2.0, inertia=0.151, mass=2.23,
            handle_radius=0.023, face_radius=0.097, face_dir=(0.0, 0.0, 1.0),
            panel=True,
            # same world geometry as door-open: the panel slab sits 0.12
            # on the +motion side of the pivot->handle line in EVERY pose
            # (the q-convention mirror rotates arm and tangent together,
            # so the sign does NOT flip — a -0.12 put a phantom panel in
            # the approach pocket south of the closed door's handle and
            # Coulomb-froze the open-loop hand 0.16 m short of the mocap)
            panel_off=0.12,
        )],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="door-close-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([0.0, 0.85, 0.15]),
        rand_high=np.array([0.1, 0.95, 0.15]),
        hand_init_pos=np.array([-0.5, 0.6, 0.2]),
        goal_low=np.array([0.2, 0.65, 0.1499]),
        goal_high=np.array([0.3, 0.75, 0.1501]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # the door starts open: q0 is the open-door handle orientation
        # (ref trace obs0[7:11]); R(z, joint_q) composes as it closes
        obj_quat0=np.array([[0.595, 0.382, -0.595, 0.382],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("xyzw", "xyzw"),
        quat_joint=(0, -1),
        n_obs_obj=1,
    )
