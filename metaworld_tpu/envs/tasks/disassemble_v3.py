"""disassemble-v3: lift the ring wrench off the peg.

Ref metaworld/envs/sawyer_disassemble_peg_v3.py: ring at rand (x in [0,0.1],
y in [0.6,0.75], 0.025); peg under it; target = ring + (0,0,0.15); success
obs[6] > target_z; v2 reward: quat gate x (2*caging(high) + 6*lift shaping
toward target + (0,0,0.1)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.envs.tasks.assembly_v3 import _HANDLE_LEN, assembly_obs
from metaworld_tpu.rewards import utils as reward_utils


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.1

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    ring = rand[:3]
    target = ring + jnp.array([0.0, 0.0, 0.15])
    return dict(
        obj_pos=common.pad_obj_pos(ring),
        obj_init_pos=common.pad_obj_pos(ring),
        target=target,
    )


def _reward(spec: TaskSpec, state, obs, action):
    hand = obs[:3]
    wrench = obs[4:7]
    wrench_center = state.sim.obj_pos[0]
    threshold = _HANDLE_LEN / 2.0
    wx = jnp.where(jnp.abs(wrench[0] - hand[0]) < threshold, hand[0], wrench[0])
    wrench_threshed = jnp.array([wx, wrench[1], wrench[2]])
    ideal = jnp.array([0.707, 0.0, 0.0, 0.707])
    reward_quat = jnp.maximum(1.0 - jnp.linalg.norm(obs[7:11] - ideal) / 0.4, 0.0)
    reward_grab = gripper_caging_reward(
        spec, state, action, wrench_threshed,
        object_reach_radius=0.01, obj_radius=0.015,
        pad_success_thresh=0.02, xz_thresh=0.01, high_density=True,
    )
    pos_error = state.target + jnp.array([0.0, 0.0, 0.1]) - wrench_center
    a, b = 0.1, 0.9
    lifted = wrench_center[2] > 0.02
    reward_in_place = a * lifted + b * reward_utils.tolerance(
        jnp.linalg.norm(pos_error), bounds=(0, 0.02), margin=0.2,
        sigmoid="long_tail",
    )
    reward = (2.0 * reward_grab + 6.0 * reward_in_place) * reward_quat
    success = obs[6] > state.target[2]
    reward = jnp.where(success, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=success.astype(jnp.float32),
        near_object=reward_quat,
        grasp_success=(reward_grab >= 0.5).astype(jnp.float32),
        grasp_reward=reward_grab,
        in_place_reward=reward_in_place,
        obj_to_target=0.0,
    )


@registry.register("disassemble-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.04, half_h=0.025, graspable=True,
                      grasp_halfwidth=0.015, grasp_off=(0.13, 0.0, 0.0))],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="disassemble-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([0.0, 0.6, 0.025, -0.1, 0.6, 0.1699]),
        rand_high=np.array([0.1, 0.75, 0.02501, 0.1, 0.75, 0.1701]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.array([-0.1, 0.6, 0.1699]),
        goal_high=np.array([0.1, 0.75, 0.1701]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=assembly_obs,
        obj_quat0=np.array([[0.70710678, 0.0, 0.0, 0.70710678],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
