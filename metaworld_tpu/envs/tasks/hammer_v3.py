"""hammer-v3: grab the hammer and drive the nail into the box.

Ref metaworld/envs/sawyer_hammer_v3.py: hammer at rand (x in [-0.1,0.1],
y in [0.4,0.5], 0); box fixed at (0.24,0.85,0); nail head at box +
(0,-0.21,0.11) sliding +y, success qpos > 0.09; target = goal site
(0.24, 0.74, 0.11). v2 reward (:150-230): quat gate x (2*caging(thresholded
handle) + 6*position); hammer head = hammer + (0.16,0.06,0).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward
from metaworld_tpu.envs.scene_builder import FixtureJoint, FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_BOX = (0.24, 0.85, 0.0)
_NAIL_OFF = (0.0, -0.21, 0.11)
_HEAD_OFF = (0.16, 0.06, 0.0)
_HANDLE_LEN = 0.14


def _reset(spec: TaskSpec, rand, rng):
    hammer = jnp.array([rand[0], rand[1], 0.0])
    box = jnp.asarray(_BOX)
    target = jnp.array([0.24, 0.74, 0.11])
    return dict(
        fixture_pos=box,
        obj_pos=common.pad_obj_pos(hammer),
        obj_init_pos=common.pad_obj_pos(hammer),
        target=target,
    )


def _obs(spec: TaskSpec, state):
    nail = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    pos = jnp.stack([state.sim.obj_pos[0], nail[0]])
    return pos, common.live_quat(spec, state)


def _reward(spec: TaskSpec, state, obs, action):
    hand = obs[:3]
    hammer = obs[4:7]
    hammer_head = hammer + jnp.asarray(_HEAD_OFF)
    # thresholded handle x (ref :180-186)
    threshold = _HANDLE_LEN / 2.0
    hx = jnp.where(jnp.abs(hammer[0] - hand[0]) < threshold, hand[0], hammer[0])
    hammer_threshed = jnp.array([hx, hammer[1], hammer[2]])
    ideal = jnp.array([1.0, 0.0, 0.0, 0.0])
    reward_quat = jnp.maximum(1.0 - jnp.linalg.norm(obs[7:11] - ideal) / 0.4, 0.0)
    reward_grab = gripper_caging_reward(
        spec, state, action, hammer_threshed,
        object_reach_radius=0.01, obj_radius=0.015,
        pad_success_thresh=0.02, xz_thresh=0.01, high_density=True,
    )
    a, b = 0.1, 0.9
    pos_error = state.target - hammer_head
    lifted = hammer_head[2] > 0.02
    reward_in_place = a * lifted + b * reward_utils.tolerance(
        jnp.linalg.norm(pos_error), bounds=(0, 0.02), margin=0.2,
        sigmoid="long_tail",
    )
    reward = (2.0 * reward_grab + 6.0 * reward_in_place) * reward_quat
    success = state.sim.joint_q[0] > 0.09
    reward = jnp.where(success & (reward > 5.0), 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=success.astype(jnp.float32),
        near_object=reward_quat,
        grasp_success=(reward_grab >= 0.5).astype(jnp.float32),
        grasp_reward=reward_grab,
        in_place_reward=reward_in_place,
        obj_to_target=0.0,
    )


@registry.register("hammer-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.035, half_h=0.02, graspable=True,
                      grasp_halfwidth=0.018, tool_off=_HEAD_OFF,
                      grasp_off=(-0.045, 0.0, 0.0), droop=0.12)],
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(0.0, 1.0, 0.0), anchor=_NAIL_OFF,
            range=(0.0, 0.102), damping=12.0, inertia=0.25, handle_radius=0.03,
        )],
        boxes=[StaticBox(pos=(0.0, 0.0, 0.055), size=(0.12, 0.1, 0.055),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="hammer-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([-0.1, 0.4, 0.0]),
        rand_high=np.array([0.1, 0.5, 0.0]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.array([0.2399, 0.7399, 0.109]),
        goal_high=np.array([0.2401, 0.7401, 0.111]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # hammer body xquat rests with a slight head-down pitch
        # (ref golden obs0[7:11] = [1, 0, -0.03, 0] before normalization)
        obj_quat0=np.array([[0.99955, 0.0, -0.0299865, 0.0],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=2,
    )
