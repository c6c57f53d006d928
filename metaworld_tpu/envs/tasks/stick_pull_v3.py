"""stick-pull-v3: insert the stick through the thermos handle and drag it.

Ref metaworld/envs/sawyer_stick_pull_v3.py: stick at rand xy in
[-0.08,-0.03]x[0.58,0.62]; thermos at (0.2,0.6) obs z 0.132; target
([0.35,0.45], [0.4,0.5], stick z); inserted = (stick_end_x >= handle_x and
|dy| <= 0.04 and |dz| <= 0.06, :187-194); success = |handle - target| <=
0.12 and inserted; v2 reward (:196-280).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward, touching_main_object
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import maths
from metaworld_tpu.envs.tasks.stick_push_v3 import (
    _THERMOS0_COM, _THERMOS0_REF_INIT, _THERMOS_KICK, stick_scene,
    thermos_obs)
from metaworld_tpu.rewards import utils as reward_utils

# stick_end site local pos (assets/objects/assets/stick.xml:5)
_STICK_END_OFF = (0.05, 0.0, 0.0)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.1

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    stick = jnp.array([rand[0], rand[1], 0.02])
    target = jnp.array([rand[3], rand[4], 0.02])
    thermos = jnp.asarray(_THERMOS0_COM)
    return dict(
        obj_pos=common.pad_obj_pos(stick, thermos),
        obj_vel=_THERMOS_KICK,  # reference reset leaves the container
        # coasting +x at 0.6793 m/s (see stick_push_v3._THERMOS_KICK)
        obj_init_pos=common.pad_obj_pos(jnp.asarray(_THERMOS0_REF_INIT)),
        target=target,
        extras=common.extras_vec(stick[0], stick[1], stick[2]),
    )


def _inserted(stick_end, handle):
    return (
        (stick_end[0] >= handle[0])
        & (jnp.abs(stick_end[1] - handle[1]) <= 0.040)
        & (jnp.abs(stick_end[2] - handle[2]) <= 0.060)
    )


def _reward(spec: TaskSpec, state, obs, action):
    target_radius = 0.05
    tcp = state.sim.hand
    stick = obs[4:7]
    # stick_end site on the rotating stick (ref sawyer_stick_pull_v3.py:73):
    # world offset at reset rotated by the live delta quat
    end_of_stick = state.sim.obj_pos[0] + maths.quat_rotate(
        state.sim.obj_quat[0], jnp.asarray(_STICK_END_OFF))
    container = obs[11:14] + jnp.array([0.05, 0.0, 0.0])
    container_init = state.obj_init_pos[0] + jnp.array([0.05, 0.0, 0.0])
    handle = obs[11:14]
    tcp_opened = obs[3]
    target = state.target
    stick_init = state.extras[:3]

    tcp_to_stick = jnp.linalg.norm(stick - tcp)
    handle_to_target = jnp.linalg.norm(handle - target)
    yz_scaling = jnp.array([1.0, 1.0, 2.0])
    stick_to_container = jnp.linalg.norm((stick - container) * yz_scaling)
    stick_in_place_margin = jnp.linalg.norm((stick_init - container_init) * yz_scaling)
    stick_in_place = reward_utils.tolerance(
        stick_to_container, bounds=(0, target_radius), margin=stick_in_place_margin,
        sigmoid="long_tail",
    )
    stick_to_target = jnp.linalg.norm(stick - target)
    stick_in_place_2 = reward_utils.tolerance(
        stick_to_target, bounds=(0, target_radius),
        margin=jnp.linalg.norm(stick_init - target), sigmoid="long_tail",
    )
    container_to_target = jnp.linalg.norm(container - target)
    container_in_place = reward_utils.tolerance(
        container_to_target, bounds=(0, target_radius),
        margin=jnp.linalg.norm(state.obj_init_pos[0] - target), sigmoid="long_tail",
    )
    object_grasped = gripper_caging_reward(
        spec, state, action, stick,
        obj_radius=0.014, pad_success_thresh=0.05,
        object_reach_radius=0.01, xz_thresh=0.01, high_density=True,
    )
    grasp_success = (tcp_to_stick < 0.02) & (tcp_opened > 0) & (
        stick[2] - 0.01 > stick_init[2]
    )
    object_grasped = jnp.where(grasp_success, 1.0, object_grasped)
    base = reward_utils.hamacher_product(object_grasped, stick_in_place)
    inserted = _inserted(end_of_stick, handle)
    reward = base
    reward = jnp.where(grasp_success, 1.0 + base + 5.0 * stick_in_place, reward)
    reward = jnp.where(
        grasp_success & inserted,
        1.0 + base + 5.0 + 2.0 * stick_in_place_2 + 1.0 * container_in_place,
        reward,
    )
    reward = jnp.where(
        grasp_success & inserted & (handle_to_target <= 0.12), 10.0, reward
    )
    success = (handle_to_target <= 0.12) & inserted
    info_grasp = (
        touching_main_object(state) & (tcp_opened > 0) & (obs[6] - 0.02 > 0.02)
    )
    return common.eval_out(
        reward=reward,
        success=success.astype(jnp.float32),
        near_object=(tcp_to_stick <= 0.03).astype(jnp.float32),
        grasp_success=info_grasp.astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=stick_in_place,
        obj_to_target=handle_to_target,
    )


@registry.register("stick-pull-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="stick-pull-v3",
        task_id=task_id,
        scene=stick_scene(link=True),
        rand_low=np.array([-0.1, 0.55, 0.0, 0.35, 0.45, 0.0199]),
        rand_high=np.array([0.0, 0.65, 0.001, 0.45, 0.55, 0.0201]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([0.35, 0.45, 0.0199]),
        goal_high=np.array([0.45, 0.55, 0.0201]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=thermos_obs,
        n_obs_obj=2,
        quat_style=("xyzw", "zeros"),
    )
