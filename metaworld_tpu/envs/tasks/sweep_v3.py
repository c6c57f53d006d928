"""sweep-v3: sweep the puck off to the right edge of the table.

Contract from ref metaworld/envs/sawyer_sweep_v3.py: rand = obj (x,y,0.02)
only; target = (0.5, obj_y, 0.01). v2 reward (:229-262): grip-variant caging
(grip_margin +0.01, xz 0.005, OBJ_RADIUS 0.02), reward = 2*grasp +
6*hamacher(grasp, in_place); success |obj-target| <= 0.05.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward_grip, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.1, 0.6, 0.02)
_OBJ_HIGH = (0.1, 0.7, 0.02)
_GOAL_LOW = (0.49, 0.6, 0.00)
_GOAL_HIGH = (0.51, 0.7, 0.02)


def _reset(spec: TaskSpec, rand, rng):
    # the reference writes qpos z = 0.02 for the BODY FRAME (block.xml's
    # geom sits at +0.02 inside the body), so the block spawns 2 cm above
    # its rest and falls: reported z 0.02 -> ~0.0 over the first few steps
    # (golden trace t0=+0.020, t8=-0.002). Our COM spawns at 0.04 and
    # settles to 0.02; the -0.02 report offset reproduces both endpoints.
    obj = jnp.array([rand[0], rand[1], 0.04])
    target = jnp.array([0.5, rand[1], 0.01])
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(jnp.array([rand[0], rand[1], 0.02])),
        target=target,
    )


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp_opened = obs[3]
    target = state.target
    obj_to_target = jnp.linalg.norm(obj - target)
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.05), margin=in_place_margin,
        sigmoid="long_tail",
    )
    object_grasped = gripper_caging_reward_grip(
        spec, state, action, obj, obj_radius=0.02,
        grip_margin_add=0.01, xz_margin=0.005,
    )
    in_place_and_grasped = reward_utils.hamacher_product(object_grasped, in_place)
    reward = 2.0 * object_grasped + 6.0 * in_place_and_grasped
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)

    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.05).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
        grasp_success=(touching_main_object(state) & (tcp_opened > 0)).astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=obj_to_target,
    )


@registry.register("sweep-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.02, half_h=0.02, graspable=True, grasp_halfwidth=0.0227,
                      friction=1.0)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="sweep-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.asarray(_OBJ_LOW),
        rand_high=np.asarray(_OBJ_HIGH),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        # ref reports data.body("obj").xpos = block bottom-face frame
        # (sawyer_sweep_v3.py:96-97, block.xml geom at +0.02)
        obj_report_off=np.array([[0.0, 0.0, -0.02], [0.0, 0.0, 0.0]],
                                np.float32),
        goal_low=np.asarray(_GOAL_LOW),
        goal_high=np.asarray(_GOAL_HIGH),
        reset_fn=_reset,
        reward_fn=_reward,
        n_obs_obj=1,
        # ref emits the body xquat (wxyz identity at rest)
        quat_style=("wxyz", "wxyz"),
    )
