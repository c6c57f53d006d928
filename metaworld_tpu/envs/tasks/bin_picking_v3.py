"""bin-picking-v3: move the cube from bin A to bin B.

Contract from ref metaworld/envs/sawyer_bin_picking_v3.py: obj xy in
[-0.21,-0.03]x[0.65,0.75] resting at COM z 0.03 (bin floor 0.01); target =
bin_goal body COM (0.12, 0.7, ~0); hand_low z 0.07. v2 reward (:150-220):
twin log-funnel floor guard over both bins, base caging (xz 0.01, effort 0.7,
high_density); grasp = near(0.04) & lifted & not pinched (obs[3] >= 0.43);
the in_place margin latches to the FIRST step's target distance
(_target_to_obj_init); success obj_to_target <= 0.05.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.21, 0.65, 0.02)
_OBJ_HIGH = (-0.03, 0.75, 0.02)
_GOAL_LOW = (0.1199, 0.699, -0.001)
_GOAL_HIGH = (0.1201, 0.701, 0.001)


def _reset(spec: TaskSpec, rand, rng):
    obj = jnp.array([rand[0], rand[1], 0.03])
    target = jnp.array([0.12, 0.7, 0.0])
    # latch the in_place margin at reset (the reference latches on the first
    # compute_reward call, one physics step later — the object is static)
    t2o_init = jnp.linalg.norm(obj - target)
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(obj),
        target=target,
        extras=common.extras_vec(t2o_init),
    )


def _reward(spec: TaskSpec, state, obs, action):
    hand = obs[:3]
    obj = obs[4:7]
    target_to_obj = jnp.linalg.norm(obj - state.target)
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, 0.05), margin=state.extras[0],
        sigmoid="long_tail",
    )
    threshold = 0.03
    r1 = jnp.linalg.norm(hand[:2] - state.obj_init_pos[0, :2])
    r2 = jnp.linalg.norm(hand[:2] - state.target[:2])

    def funnel(radius):
        return jnp.where(
            radius > threshold,
            0.02 * jnp.log(jnp.maximum(radius - threshold, 1e-12)) + 0.2,
            0.0,
        )

    floor = jnp.minimum(funnel(r1), funnel(r2))
    above_floor = jnp.where(
        hand[2] >= floor,
        1.0,
        reward_utils.tolerance(
            jnp.maximum(floor - hand[2], 0.0),
            bounds=(0.0, 0.01), margin=0.05, sigmoid="long_tail",
        ),
    )
    object_grasped = gripper_caging_reward(
        spec, state, action, obj,
        obj_radius=0.015, pad_success_thresh=0.05,
        object_reach_radius=0.01, xz_thresh=0.01,
        desired_gripper_effort=0.7, high_density=True,
    )
    reward = reward_utils.hamacher_product(object_grasped, in_place)
    near_object = jnp.linalg.norm(obj - hand) < 0.04
    pinched_without_obj = obs[3] < 0.43
    lifted = obj[2] - 0.02 > state.obj_init_pos[0, 2]
    grasp_success = near_object & lifted & jnp.logical_not(pinched_without_obj)
    reward = jnp.where(
        grasp_success,
        reward + 1.0 + 5.0 * reward_utils.hamacher_product(above_floor, in_place),
        reward,
    )
    reward = jnp.where(target_to_obj < 0.05, 10.0, reward)

    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= 0.05).astype(jnp.float32),
        near_object=near_object.astype(jnp.float32),
        grasp_success=grasp_success.astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("bin-picking-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        # the cube rests on the bin floor 1 cm above the table
        objs=[FreeObj(radius=0.02, half_h=0.03, graspable=True, grasp_halfwidth=0.022,
                      droop=0.02)],
        mocap_low=(-0.5, 0.40, 0.07),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="bin-picking-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.concatenate([_OBJ_LOW, _GOAL_LOW]),
        rand_high=np.concatenate([_OBJ_HIGH, _GOAL_HIGH]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.asarray(_GOAL_LOW),
        goal_high=np.asarray(_GOAL_HIGH),
        reset_fn=_reset,
        reward_fn=_reward,
        n_obs_obj=1,
        # ref emits the body xquat (wxyz identity at rest)
        quat_style=("wxyz", "wxyz"),
    )
