"""push-back-v3: pull the puck back toward the robot.

Contract from ref metaworld/envs/sawyer_push_back_v3.py: obj in
[-0.1,0.1]x[0.8,0.85], goal in [-0.1,0.1]x[0.6,0.7], both z=0.02; resample
until |obj_xy-goal_xy| >= 0.15. v2 reward (:253-291): its own caging variant
(y_gripping with grip margin obj_radius+0.003, xz margin 0.01, averaged not
hamacher'd, :150-251) x in_place; bonus needs 0<tcp_opened<0.55 and 1cm of
progress; success obj_to_target <= 0.07.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.1, 0.8, 0.02)
_OBJ_HIGH = (0.1, 0.85, 0.02)
_GOAL_LOW = (-0.1, 0.6, 0.0199)
_GOAL_HIGH = (0.1, 0.7, 0.0201)
_OBJ_RADIUS = 0.007


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    obj = jnp.array([rand[0], rand[1], 0.02])
    target = jnp.array([rand[3], rand[4], 0.02])
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(obj),
        target=target,
    )


def _caging(state, action, obj):
    """push-back's caging variant (ref :150-251): adds a y_gripping band and
    averages caging with gripping instead of the hamacher product."""
    pad_success_margin = 0.05
    grip_success_margin = _OBJ_RADIUS + 0.003
    x_z_success_margin = 0.01
    tcp = state.sim.hand
    left_pad, right_pad = engine.pad_positions(state.sim)
    delta_y_left = left_pad[1] - obj[1]
    delta_y_right = obj[1] - right_pad[1]
    right_margin = jnp.abs(jnp.abs(obj[1] - right_pad[1]) - pad_success_margin)
    left_margin = jnp.abs(jnp.abs(obj[1] - left_pad[1]) - pad_success_margin)

    def tol(x, hi, margin):
        return reward_utils.tolerance(
            x, bounds=(_OBJ_RADIUS, hi), margin=margin, sigmoid="long_tail"
        )

    right_caging = tol(delta_y_right, pad_success_margin, right_margin)
    left_caging = tol(delta_y_left, pad_success_margin, left_margin)
    right_gripping = tol(delta_y_right, grip_success_margin, right_margin)
    left_gripping = tol(delta_y_left, grip_success_margin, left_margin)
    y_caging = reward_utils.hamacher_product(right_caging, left_caging)
    y_gripping = reward_utils.hamacher_product(right_gripping, left_gripping)

    tcp_xz = jnp.array([tcp[0], 0.0, tcp[2]])
    obj_xz = jnp.array([obj[0], 0.0, obj[2]])
    tcp_obj_xz = jnp.linalg.norm(tcp_xz - obj_xz)
    init_obj = state.obj_init_pos[0]
    init_obj_xz = jnp.array([init_obj[0], 0.0, init_obj[2]])
    init_tcp_xz = jnp.array([state.init_tcp[0], 0.0, state.init_tcp[2]])
    xz_margin = jnp.linalg.norm(init_obj_xz - init_tcp_xz) - x_z_success_margin
    x_z_caging = reward_utils.tolerance(
        tcp_obj_xz, bounds=(0, x_z_success_margin), margin=xz_margin,
        sigmoid="long_tail",
    )
    caging = reward_utils.hamacher_product(y_caging, x_z_caging)
    gripping = jnp.where(caging > 0.95, y_gripping, 0.0)
    return (caging + gripping) / 2


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp_opened = obs[3]
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    target_to_obj = jnp.linalg.norm(obj - state.target)
    target_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.target)

    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, 0.05), margin=target_to_obj_init,
        sigmoid="long_tail",
    )
    object_grasped = _caging(state, action, obj)
    reward = reward_utils.hamacher_product(object_grasped, in_place)
    bonus = (
        (tcp_to_obj < 0.01)
        & (0 < tcp_opened)
        & (tcp_opened < 0.55)
        & (target_to_obj_init - target_to_obj > 0.01)
    )
    reward = jnp.where(bonus, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(target_to_obj < 0.05, 10.0, reward)

    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= 0.07).astype(jnp.float32),
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


@registry.register("push-back-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.02, half_h=0.02, graspable=True, grasp_halfwidth=0.0227)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="push-back-v3",
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
