"""hand-insert-v3: push the obj (and hand) down into the table hole.

Contract from ref metaworld/envs/sawyer_hand_insert_v3.py: hand_low z -0.15
(the hand may descend into the hole); obj (x,y,0.05), goal in
[-0.04,0.04]x[0.8,0.88]x~-0.02; resample until |obj_xy-goal_xy| >= 0.15.
v2 reward (:131-171): base caging (high_density, radius 0.015, pad 0.05,
xz 0.005) hamacher'd with in_place; +1+7*in_place when near & open>0;
success obj_to_target <= 0.05.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.1, 0.6, 0.05)
_OBJ_HIGH = (0.1, 0.7, 0.05)
_GOAL_LOW = (-0.04, 0.8, -0.0201)
_GOAL_HIGH = (0.04, 0.88, -0.0199)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    obj = jnp.array([rand[0], rand[1], 0.05])
    target = rand[3:6]
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(obj),
        target=target,
    )


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp_opened = obs[3]
    target_to_obj = jnp.linalg.norm(obj - state.target)
    target_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.target)
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, 0.05), margin=target_to_obj_init,
        sigmoid="long_tail",
    )
    object_grasped = gripper_caging_reward(
        spec, state, action, obj,
        object_reach_radius=0.01, obj_radius=0.015,
        pad_success_thresh=0.05, xz_thresh=0.005, high_density=True,
    )
    reward = reward_utils.hamacher_product(object_grasped, in_place)
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    near = (tcp_to_obj < 0.02) & (tcp_opened > 0)
    reward = jnp.where(near, reward + 1.0 + 7.0 * in_place, reward)
    reward = jnp.where(target_to_obj < 0.05, 10.0, reward)

    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= 0.05).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
        grasp_success=(
            touching_main_object(state)
            & (tcp_opened > 0)
            & (obj[2] - 0.02 > state.obj_init_pos[0, 2])
        ).astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("hand-insert-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.02, half_h=0.02, graspable=True, grasp_halfwidth=0.0227)],
        hole_center=(0.0, 0.84),
        # basic_scene_b: tabletop at +0.05, hole x +-0.08 / y 0.76..0.92,
        # pit floor at -0.05 (ref assets/scene/basic_scene_b.xml:33-37) —
        # the block rests at COM 0.07 on the table, -0.03 in the pit
        hole_halfsize=(0.08, 0.08),
        pit_depth=0.10,
        table_z=0.05,
        mocap_low=(-0.5, 0.40, -0.15),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="hand-insert-v3",
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
