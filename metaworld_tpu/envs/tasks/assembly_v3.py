"""assembly-v3: pick up the ring wrench and drop it over the peg.

Ref metaworld/envs/sawyer_assembly_peg_v3.py: wrench at (0,0.6,0.02) (obs =
ring center + (0.13,0,0)); peg at goal rand in [-0.1,0.1]x[0.75,0.85] z 0.1;
reject until dist >= 0.1; success = ring center aligned (xy < 0.02) and
below the peg top (hooked); v2 reward: quat gate x (2*caging(medium) +
6*funnel placement).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import maths
from metaworld_tpu.rewards import utils as reward_utils

_HANDLE_OFF = (0.13, 0.0, 0.0)
_HANDLE_LEN = 0.02


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.1

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    ring = rand[:3]  # ring center (RoundNut site)
    target = rand[3:6]
    return dict(
        obj_pos=common.pad_obj_pos(ring),
        obj_init_pos=common.pad_obj_pos(ring),
        target=target,
    )


def assembly_obs(spec: TaskSpec, state):
    off = maths.quat_rotate(state.sim.obj_quat[0], jnp.asarray(_HANDLE_OFF))
    pos = state.sim.obj_pos + jnp.array([[1.0], [0.0]]) * off[None, :]
    return pos, common.live_quat(spec, state)


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
        pad_success_thresh=0.02, xz_thresh=0.01, medium_density=True,
    )
    # placement funnel (ref :176-203)
    pos_error = state.target - wrench_center
    radius = jnp.linalg.norm(pos_error[:2])
    aligned = radius < 0.02
    hooked = pos_error[2] > 0.0
    success = aligned & hooked
    threshold_r = jnp.where(success, 0.02, 0.01)
    target_height = jnp.where(
        radius > threshold_r,
        0.02 * jnp.log(jnp.maximum(radius - threshold_r, 1e-12)) + 0.2,
        0.0,
    )
    pos_error = pos_error.at[2].set(target_height - wrench_center[2])
    scale = jnp.array([1.0, 1.0, 3.0])
    a, b = 0.1, 0.9
    lifted = (wrench_center[2] > 0.02) | (radius < threshold_r)
    reward_in_place = a * lifted + b * reward_utils.tolerance(
        jnp.linalg.norm(pos_error * scale), bounds=(0, 0.02), margin=0.4,
        sigmoid="long_tail",
    )
    reward = (2.0 * reward_grab + 6.0 * reward_in_place) * reward_quat
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


@registry.register("assembly-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.04, half_h=0.02, graspable=True,
                      grasp_halfwidth=0.015, grasp_off=(0.13, 0.0, 0.0),
                      droop=0.03)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="assembly-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([0.0, 0.6, 0.02, -0.1, 0.75, 0.1]),
        rand_high=np.array([0.0, 0.6, 0.02, 0.1, 0.85, 0.1]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.1, 0.75, 0.1]),
        goal_high=np.array([0.1, 0.85, 0.1]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=assembly_obs,
        # RoundNut body xquat (ref sawyer_assembly_peg_v3.py:108-109)
        obj_quat0=np.array([[0.70710678, 0.0, 0.0, 0.70710678],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
