"""reach-wall-v3: reach the target over a wall.

Contract from ref metaworld/envs/sawyer_reach_wall_v3.py: obj in
[-0.05,0.05]x[0.6,0.65], goal in [-0.05,0.05]x[0.85,0.9]x[0.05,0.3];
resample until |obj_xy-goal_xy| >= 0.15; v2 reward = 10*tolerance as reach;
success tcp_to_target <= 0.05.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.05, 0.6, 0.015)
_OBJ_HIGH = (0.05, 0.65, 0.015)
_GOAL_LOW = (-0.05, 0.85, 0.05)
_GOAL_HIGH = (0.05, 0.9, 0.3)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    obj = jnp.array([rand[0], rand[1], 0.02])
    target = rand[3:6]
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(obj),
        target=target,
    )


def _reward(spec: TaskSpec, state, obs, action):
    tcp = state.sim.hand
    target = state.target
    tcp_to_target = jnp.linalg.norm(tcp - target)
    in_place_margin = jnp.linalg.norm(state.hand_init - target)
    in_place = reward_utils.tolerance(
        tcp_to_target, bounds=(0, 0.05), margin=in_place_margin,
        sigmoid="long_tail",
    )
    return common.eval_out(
        reward=10.0 * in_place,
        success=(tcp_to_target <= 0.05).astype(jnp.float32),
        near_object=0.0,
        grasp_success=0.0,
        grasp_reward=0.0,
        in_place_reward=in_place,
        obj_to_target=tcp_to_target,
    )


@registry.register("reach-wall-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.02, half_h=0.02, graspable=True, grasp_halfwidth=0.0227)],
        boxes=[StaticBox(pos=(0.1, 0.75, 0.06), size=(0.12, 0.01, 0.06))],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="reach-wall-v3",
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
