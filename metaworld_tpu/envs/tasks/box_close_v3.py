"""box-close-v3: pick up the lid and place it on the box.

Ref metaworld/envs/sawyer_box_close_v3.py: lid at rand xy in
[-0.05,0.05]x[0.5,0.55] (handle obs = COM + (0,0,0.075)); box at goal rand
in [-0.1,0.1]x[0.7,0.8] z 0.133; reject until dist >= 0.25; v2 reward:
quat gate x (2*grab x readiness + 8*place); success |obs - target| < 0.08.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import maths
from metaworld_tpu.rewards import utils as reward_utils

_HANDLE_OFF = (0.0, 0.0, 0.075)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.25

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    # the reference SPAWNS the lid in mid-air at COM 0.095 and lets it
    # free-fall to its 0.015 rest in the first ~11 steps (golden obs z:
    # 0.095 -> 0.0097 over t=0..11) — the reset obs reads the pre-fall
    # height
    lid = jnp.array([rand[0], rand[1], 0.095])
    target = rand[3:6]
    box = jnp.array([target[0], target[1], 0.0])
    return dict(
        obj_pos=common.pad_obj_pos(lid),
        obj_init_pos=common.pad_obj_pos(
            jnp.array([rand[0], rand[1], 0.02])),
        target=target,
        fixture_pos=box,
    )


def _obs(spec: TaskSpec, state):
    # ref obs = get_body_com("top_link") — the lid PLATE's COM directly
    # (sawyer_box_close_v3.py:101-102); the handle knob is grasp geometry,
    # not the observation point
    return state.sim.obj_pos, common.live_quat(spec, state)


def _reward(spec: TaskSpec, state, obs, action):
    reward_grab = jnp.clip((jnp.clip(action[3], -1.0, 1.0) + 1.0) / 2.0, 0.0, 1.0)
    ideal = jnp.array([0.707, 0.0, 0.0, 0.707])
    reward_quat = jnp.maximum(1.0 - jnp.linalg.norm(obs[7:11] - ideal) / 0.2, 0.0)

    hand = obs[:3]
    lid = obs[4:7] + jnp.array([0.0, 0.0, 0.02])
    threshold = 0.02
    radius = jnp.linalg.norm(hand[:2] - lid[:2])
    floor = jnp.where(
        radius <= threshold,
        0.0,
        0.04 * jnp.log(jnp.maximum(radius - threshold, 1e-12)) + 0.4,
    )
    above_floor = jnp.where(
        hand[2] >= floor,
        1.0,
        reward_utils.tolerance(
            floor - hand[2], bounds=(0.0, 0.01),
            margin=jnp.maximum(floor / 2.0, 1e-6), sigmoid="long_tail",
        ),
    )
    in_place = reward_utils.tolerance(
        jnp.linalg.norm(hand - lid), bounds=(0, 0.02), margin=0.5,
        sigmoid="long_tail",
    )
    ready_to_lift = reward_utils.hamacher_product(above_floor, in_place)
    error_scale = jnp.array([1.0, 1.0, 3.0])
    a, b = 0.2, 0.8
    pos_error = state.target - lid
    lifted = a * (lid[2] > 0.04) + b * reward_utils.tolerance(
        jnp.linalg.norm(pos_error * error_scale), bounds=(0, 0.05), margin=0.25,
        sigmoid="long_tail",
    )
    reward = 2.0 * reward_utils.hamacher_product(reward_grab, ready_to_lift) + 8.0 * lifted
    success = jnp.linalg.norm(obs[4:7] - state.target) < 0.08
    reward = jnp.where(success, 10.0, reward)
    reward = reward * reward_quat
    return common.eval_out(
        reward=reward,
        success=success.astype(jnp.float32),
        near_object=ready_to_lift,
        grasp_success=(reward_grab >= 0.5).astype(jnp.float32),
        grasp_reward=reward_grab,
        in_place_reward=lifted,
        obj_to_target=0.0,
    )


@registry.register("box-close-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.04, half_h=0.015, graspable=True,
                      grasp_halfwidth=0.018, grasp_off=(0.0, 0.0, 0.075),
                      droop=0.10)],
        # the open box the lid gets placed on
        boxes=[StaticBox(pos=(0.0, 0.0, 0.02), size=(0.09, 0.09, 0.02),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="box-close-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([-0.05, 0.5, 0.02, -0.1, 0.7, 0.133]),
        rand_high=np.array([0.05, 0.55, 0.02, 0.1, 0.8, 0.133]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.1, 0.7, 0.133]),
        goal_high=np.array([0.1, 0.8, 0.133]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # BoxHandle body xquat (ref sawyer_box_close_v3.py)
        obj_quat0=np.array([[0.70710678, 0.0, 0.0, 0.70710678],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
