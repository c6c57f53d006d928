"""stick-push-v3: grab the stick and push the thermos to the goal.

Ref metaworld/envs/sawyer_stick_push_v3.py: stick at rand xy in
[-0.08,-0.03]x[0.58,0.62] (COM z 0.02); thermos (container) at (0.2,0.6)
with obs COM z 0.132; target (0.4, [0.55,0.6], 0.132); v2 reward
(:169-230); info success = grasp_success AND |container-target| <= 0.12.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_THERMOS0_COM = (0.25, 0.6, 0.132)   # container body COM (physical)
_THERMOS0_REF_INIT = (0.2, 0.6, 0.0)  # reference get_body_com at reset
_THERMOS_OBS_OFF = (-0.05, 0.0, 0.0)  # observed handle site rel. COM
# The reference's reset leaves the container with a +x velocity of
# 0.6793 m/s (the 50-step hand-servo resolves the stick XML's default
# interpenetration, and _set_stick_xyz zeroes only the STICK's qvel) —
# identical for every goal of both stick tasks (measured on the live
# reference, all seeds). The container coasts ~0.2 m into its +x slide
# stop in the first ~25 steps of every episode.
_THERMOS_KICK = np.zeros((2, 3))
_THERMOS_KICK[1, 0] = 0.6793


def stick_scene(link: bool):
    # stick-pull: the inserted stick tips ~0.34 rad because its far end
    # rests on the thermos handle (droop engages only once linked, see
    # engine droop_on); stick-push never inserts, tiny droop
    #
    # The container ("insertion" assembly) is a 2-dof slide body in the
    # reference — slidex/slidey range +-0.2 around body (0.2, 0.6),
    # damping 1.0 each, subtree mass 3.268 kg (compiled model) — so it is
    # planar (no lift, viscous joint damping, no table Coulomb friction:
    # the golden coast decays exactly as exp(-c t / M)). Its x reach
    # toward the stick is the HANDLE rod (contact at 0.107 m from the
    # COM; the stick's end face presses the handle's end cap), hence
    # half_x=0.107. xy_range is the slide window mapped into our COM
    # frame (push: obs==COM-0.05x; pull: the obs site additionally sits
    # 0.09 south of the body, see thermos_obs).
    return build_scene(
        objs=[
            FreeObj(radius=0.025, half_x=0.05, half_h=0.02, graspable=True,
                    grasp_halfwidth=0.015, tool_off=(0.13, 0.0, 0.0),
                    droop=-0.34 if link else -0.05),
            FreeObj(radius=0.045, oo_half_x=0.107, half_h=0.132,
                    graspable=False, mass=3.268, planar=True,
                    lin_damping=1.0,
                    xy_range=((0.05, 0.31, 0.45, 0.71) if link
                              else (0.05, 0.40, 0.45, 0.80))),
        ],
        link_enable=link,
        link_handle_off=_THERMOS_OBS_OFF,
        # ref hand_low: stick-pull reaches to y 0.35 (sawyer_stick_push_v3
        # py:26 vs sawyer_stick_pull_v3.py hand_low y=0.35)
        mocap_low=(-0.5, 0.35 if link else 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )


def thermos_obs(spec: TaskSpec, state):
    pos = state.sim.obj_pos + jnp.array([[0.0], [1.0]]) * jnp.asarray(_THERMOS_OBS_OFF)[None, :]
    # stick body xmat -> scipy xyzw; container quat = zeros
    # (ref sawyer_stick_pull_v3.py:115-129)
    return pos, common.live_quat(spec, state)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.1

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    stick = jnp.array([rand[0], rand[1], 0.02])
    target = jnp.array([rand[3], rand[4], 0.132])
    thermos = jnp.asarray(_THERMOS0_COM)
    # the reference's obj_init_pos attr is get_body_com("object") at reset
    # = (0.2, 0.6, 0); the physical container sits at _THERMOS0_COM
    return dict(
        obj_pos=common.pad_obj_pos(stick, thermos),
        obj_vel=_THERMOS_KICK,
        obj_init_pos=common.pad_obj_pos(jnp.asarray(_THERMOS0_REF_INIT)),
        target=target,
        extras=common.extras_vec(stick[0], stick[1], stick[2]),
    )


def _reward(spec: TaskSpec, state, obs, action):
    target_radius = 0.12
    tcp = state.sim.hand
    stick = obs[4:7] + jnp.array([0.015, 0.0, 0.0])
    container = obs[11:14]
    tcp_opened = obs[3]
    target = state.target
    stick_init = state.extras[:3]

    tcp_to_stick = jnp.linalg.norm(stick - tcp)
    stick_to_target = jnp.linalg.norm(stick - target)
    stick_in_place_margin = jnp.linalg.norm(stick_init - target) - target_radius
    stick_in_place = reward_utils.tolerance(
        stick_to_target, bounds=(0, target_radius), margin=stick_in_place_margin,
        sigmoid="long_tail",
    )
    container_to_target = jnp.linalg.norm(container - target)
    container_in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target) - target_radius
    container_in_place = reward_utils.tolerance(
        container_to_target, bounds=(0, target_radius),
        margin=container_in_place_margin, sigmoid="long_tail",
    )
    object_grasped = gripper_caging_reward(
        spec, state, action, stick,
        obj_radius=0.04, pad_success_thresh=0.05,
        object_reach_radius=0.01, xz_thresh=0.01, high_density=True,
    )
    holding = (tcp_to_stick < 0.02) & (tcp_opened > 0) & (
        stick[2] - 0.01 > stick_init[2]
    )
    reward = jnp.where(
        holding,
        2.0 + 5.0 * stick_in_place + 3.0 * container_in_place,
        object_grasped,
    )
    reward = jnp.where(holding & (container_to_target <= target_radius), 10.0, reward)

    grasp_success = (
        touching_main_object(state)
        & (tcp_opened > 0)
        & (obs[6] - 0.02 > 0.02)
    )
    success = (container_to_target <= target_radius) & grasp_success
    return common.eval_out(
        reward=reward,
        success=success.astype(jnp.float32),
        near_object=(tcp_to_stick <= 0.03).astype(jnp.float32),
        grasp_success=grasp_success.astype(jnp.float32),
        grasp_reward=jnp.where(holding, 1.0, object_grasped),
        in_place_reward=stick_in_place,
        obj_to_target=container_to_target,
    )


@registry.register("stick-push-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="stick-push-v3",
        task_id=task_id,
        scene=stick_scene(link=False),
        rand_low=np.array([-0.08, 0.58, 0.0, 0.399, 0.55, 0.1319]),
        rand_high=np.array([-0.03, 0.62, 0.001, 0.401, 0.6, 0.1321]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([0.399, 0.55, 0.1319]),
        goal_high=np.array([0.401, 0.6, 0.1321]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=thermos_obs,
        n_obs_obj=2,
        quat_style=("xyzw", "zeros"),
    )
