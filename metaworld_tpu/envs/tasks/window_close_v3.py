"""window-close-v3: slide the window pane shut (-x).

Ref metaworld/envs/sawyer_window_close_v3.py: window at rand (0, y in
[0.75,0.9], 0.2); slide starts open (q=0.2); handle (handleCloseStart) at
window + (0.01,-0.095,0) + q*x; target = window pos; success
|handle_x - target_x| <= 0.05; margins use handle_init = stale handle +
(0.2,0,0) (the reference reads the site before mj_forward).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.envs.tasks.window_open_v3 import make_window_scene
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils

_R = 0.05
_HANDLE_OFF = (0.01, -0.095, 0.0)


def _reset(spec: TaskSpec, rand, rng):
    window = rand[:3]
    target = window
    handle_init = window + jnp.asarray(_HANDLE_OFF) + jnp.array([0.2, 0.0, 0.0])
    return dict(
        fixture_pos=window,
        target=target,
        obj_init_pos=common.pad_obj_pos(handle_init),
        joint_q=jnp.array([0.2, 0.0]),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    return handle, jnp.zeros((2, 4))


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp = state.sim.hand
    target = state.target
    target_to_obj = jnp.abs(obj[0] - target[0])
    target_to_obj_init = jnp.abs(state.obj_init_pos[0, 0] - target[0])
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, _R),
        margin=jnp.abs(target_to_obj_init - _R), sigmoid="long_tail",
    )
    handle_radius = 0.02
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    tcp_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.init_tcp)
    reach = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, handle_radius),
        margin=jnp.abs(tcp_to_obj_init - handle_radius), sigmoid="gaussian",
    )
    reward = 10.0 * reward_utils.hamacher_product(reach, in_place)
    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= _R).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=1.0,
        grasp_reward=reach,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("window-close-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="window-close-v3",
        task_id=task_id,
        scene=make_window_scene(_HANDLE_OFF, press_off_x=-0.024),
        rand_low=np.array([0.0, 0.75, 0.2]),
        rand_high=np.array([0.0, 0.9, 0.2]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, 0.05)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        n_obs_obj=1,
    )
