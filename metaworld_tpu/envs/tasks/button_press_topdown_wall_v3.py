"""button-press-topdown-wall-v3: topdown press with a wall in the approach.

Contract from ref metaworld/envs/sawyer_button_press_topdown_wall_v3.py:
identical to topdown except tcp_closed = max(obs[3], 0) in the reward and a
wall between the hand start and the box; success |target_z - obj_z| <= 0.024.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.envs.tasks.button_press_topdown_v3 import (
    _OBJ_HIGH,
    _OBJ_LOW,
    _obs,
    _reset,
    make_topdown_scene,
)
from metaworld_tpu.rewards import utils as reward_utils


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp = state.sim.hand
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    tcp_to_obj_init = jnp.linalg.norm(obj - state.init_tcp)
    obj_to_target = jnp.abs(state.target[2] - obj[2])
    tcp_closed = jnp.maximum(obs[3], 0.0)
    near_button = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, 0.01), margin=tcp_to_obj_init, sigmoid="long_tail"
    )
    button_pressed = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.005), margin=state.extras[0], sigmoid="long_tail"
    )
    reward = 5.0 * reward_utils.hamacher_product(tcp_closed, near_button)
    reward = jnp.where(tcp_to_obj <= 0.03, reward + 5.0 * button_pressed, reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.024).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=near_button,
        in_place_reward=button_pressed,
        obj_to_target=obj_to_target,
    )


@registry.register("button-press-topdown-wall-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="button-press-topdown-wall-v3",
        task_id=task_id,
        scene=make_topdown_scene(wall=True),
        rand_low=np.asarray(_OBJ_LOW),
        rand_high=np.asarray(_OBJ_HIGH),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, 0.05)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        obj_quat0=np.array([[0.70710678, -0.70710678, 0.0, 0.0],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
