"""sweep-into-v3: sweep the puck into the hole in the table.

Contract from ref metaworld/envs/sawyer_sweep_into_goal_v3.py: rand obj xy in
[-0.1,0.1]x[0.6,0.7] (z 0.02), goal essentially fixed at (0, 0.84, 0.02)
(goal bounds +-0.001); resample until |obj_xy - target_xy| >= 0.15. v2 reward
(:222-255): grip-variant caging (grip +0.005, xz 0.01, radius 0.02), reward =
2*grasp + 6*hamacher; target z replaced by obj z; success <= 0.05.
Scene: table with a hole at the goal (assets sawyer_table_with_hole.xml).
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
_GOAL_LOW = (-0.001, 0.8399, 0.0199)
_GOAL_HIGH = (0.001, 0.8401, 0.0201)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - jnp.array([0.0, 0.84])) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    # the puck body COM sits 0.05 above its free-joint origin in this scene
    # (ref obs: COM 0.07 on the table, 0.02 once in the hole), while the
    # reference's obj_init_pos (reward margins) keeps z = 0.02
    obj_com = jnp.array([rand[0], rand[1], 0.07])
    obj_init = jnp.array([rand[0], rand[1], 0.02])
    # the reference reads obj_init_pos BEFORE re-randomizing the puck, so
    # its attr keeps the stale XML com z of 0.07 — margins key off it
    obj_init_ref = jnp.array([rand[0], rand[1], 0.07])
    target = jnp.array([0.0, 0.84, 0.02])
    return dict(
        obj_pos=common.pad_obj_pos(obj_com),
        obj_init_pos=common.pad_obj_pos(obj_init_ref),
        target=target,
    )


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp_opened = obs[3]
    target = jnp.array([state.target[0], state.target[1], obj[2]])
    obj_to_target = jnp.linalg.norm(obj - target)
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.05), margin=in_place_margin,
        sigmoid="long_tail",
    )
    object_grasped = gripper_caging_reward_grip(
        spec, state, action, obj, obj_radius=0.02,
        grip_margin_add=0.005, xz_margin=0.01,
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


@registry.register("sweep-into-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.02, half_h=0.02, graspable=True, grasp_halfwidth=0.0227)],
        # real geometry from the live reference model: tabletop slabs at
        # +0.05 (table_z) with the 0.02-half cube resting at COM 0.07;
        # hole span x [-0.08, 0.08], y [0.76, 0.92]. The pit is modeled
        # 0.05 deep (floor at 0) so the fallen block rests at z 0.02 —
        # exactly where the golden block wedges at the hole's north rim
        # (it never reaches the true -0.05 pit floor). The true tabletop
        # height matters for the HAND: the sweeping claw bottoms out at
        # tcp ~ 0.04 as the reference does (a z=0 table let it dive 50 mm
        # lower and carry the caged block high).
        hole_center=(0.0, 0.84),
        hole_halfsize=(0.08, 0.08),
        pit_depth=0.05,
        table_z=0.05,
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="sweep-into-v3",
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
    )
