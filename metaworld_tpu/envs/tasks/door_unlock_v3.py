"""door-unlock-v3: push the lock lever sideways to unlock.

Ref metaworld/envs/sawyer_door_unlock_v3.py: door at rand; lock starts
locked (q=1.5708 in the reference hinge; here the slide starts at 0) at
door + (-0.03,-0.158,-0.029); target = lock_init + (0.1,-0.04,0);
v2 reward tracks the gripper "shoulder" (obs[:3] + (0,0.055,0.07)) with
scale (0.25,1,0.5); success |target_x - lock_x| <= 0.02.
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

_LOCK_OFF = (-0.01, -0.158, -0.029)
_LOCK_LEN = 0.1
# chord toward the unlocked lever position: the reference lockhinge (range
# [0, 1.57] about +y, lever radius ~0.1) moves the lever site by
# (+0.100, 0, +0.080) over the full unlock arc (golden obs: (0.010, 0.121)
# -> (0.110, 0.201)); the old 45-degree chord with range 0.16 overshot the
# top of travel by 33 mm in z
_AXIS = (0.781, 0.0, 0.625)


def _reset(spec: TaskSpec, rand, rng):
    door = rand[:3]
    # lock_link BODY frame (door + (0,-0.118,0.061)); the obs lever site is
    # at _LOCK_OFF
    lock_body = door + jnp.array([0.0, -0.118, 0.061])
    target = lock_body + jnp.array([0.1, -0.04, 0.0])
    return dict(
        fixture_pos=door,
        target=target,
        obj_init_pos=common.pad_obj_pos(lock_body),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    quat = common.live_quat(spec, state)
    return handle, quat


def _reward(spec: TaskSpec, state, obs, action):
    gripper = obs[:3]
    lock = obs[4:7]
    offset = jnp.array([0.0, 0.055, 0.07])
    scale = jnp.array([0.25, 1.0, 0.5])
    shoulder_to_lock = (gripper + offset - lock) * scale
    shoulder_to_lock_init = (state.init_tcp + offset - state.obj_init_pos[0]) * scale
    ready_to_push = reward_utils.tolerance(
        jnp.linalg.norm(shoulder_to_lock),
        bounds=(0, 0.02),
        margin=jnp.linalg.norm(shoulder_to_lock_init),
        sigmoid="long_tail",
    )
    obj_to_target = jnp.abs(state.target[0] - lock[0])
    pushed = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.005), margin=_LOCK_LEN, sigmoid="long_tail"
    )
    reward = 2.0 * ready_to_push + 8.0 * pushed
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.02).astype(jnp.float32),
        near_object=(jnp.linalg.norm(shoulder_to_lock) <= 0.05
                     ).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=ready_to_push,
        in_place_reward=pushed,
        obj_to_target=obj_to_target,
    )


@registry.register("door-unlock-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=_AXIS, anchor=_LOCK_OFF,
            range=(0.0, 0.128), damping=6.0, inertia=0.3, handle_radius=0.03,
        )],
        # compiled doorlockA/door_link shells (see door_lock_v3.py)
        boxes=[
            StaticBox(pos=(0.0, -0.1, 0.0), size=(0.184, 0.011, 0.124),
                      rel_fixture=True),
            StaticBox(pos=(0.0, -0.109, 0.061), size=(0.047, 0.013, 0.047),
                      rel_fixture=True),
        ],
        mocap_low=(-0.5, 0.40, -0.15),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="door-unlock-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([-0.1, 0.8, 0.15]),
        rand_high=np.array([0.1, 0.85, 0.15]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([0.0, 0.64, 0.21]),
        goal_high=np.array([0.2, 0.7, 0.2111]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # body xquat (wxyz), constant identity at rest
        obj_quat0=None,
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
