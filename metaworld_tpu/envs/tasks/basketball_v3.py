"""basketball-v3: dunk the ball through the hoop.

Contract from ref metaworld/envs/sawyer_basketball_v3.py: obj (x,y,0.03) in
[-0.1,0.1]x[0.6,0.7], basket xy in [-0.1,0.1]x[0.85,0.9] z=0; reject until
|obj_xy - basket_xy| >= 0.15; basket body moves to the sampled pos and the
target is its goal site (basket + (0, -0.083, 0.25)). v2 reward (:139-199):
z-doubled scaled in_place vs target at z=0.3, base caging (radius 0.025,
pad 0.06, high_density) overridden to 1.0 once lifted; TARGET_RADIUS 0.08.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.1, 0.6, 0.0299)
_OBJ_HIGH = (0.1, 0.7, 0.0301)
_GOAL_LOW = (-0.1, 0.85, 0.0)
_GOAL_HIGH = (0.1, 0.9, 0.0)
_SITE_OFFSET = (0.0, -0.083, 0.25)  # goal site relative to the basket body
# the reference redefines goal_space to the site-offset bounds (observed from
# the live env: lo (-0.1, 0.767, 0.2499), hi (0.1, 0.817, 0.2501))
_GOAL_SPACE_LOW = (-0.1, 0.767, 0.2499)
_GOAL_SPACE_HIGH = (0.1, 0.8170001, 0.2501)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    obj = jnp.array([rand[0], rand[1], 0.03])
    basket = rand[3:6]
    target = basket + jnp.asarray(_SITE_OFFSET)
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(obj),
        target=target,
        fixture_pos=basket,
    )


def _reward(spec: TaskSpec, state, obs, action):
    target_radius = 0.08
    obj = obs[4:7]
    target = jnp.array([state.target[0], state.target[1], 0.3])
    scale = jnp.array([1.0, 1.0, 2.0])
    target_to_obj = jnp.linalg.norm((obj - target) * scale)
    target_to_obj_init = jnp.linalg.norm((state.obj_init_pos[0] - target) * scale)
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, target_radius), margin=target_to_obj_init,
        sigmoid="long_tail",
    )
    tcp_opened = obs[3]
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    object_grasped = gripper_caging_reward(
        spec, state, action, obj,
        object_reach_radius=0.01, obj_radius=0.025,
        pad_success_thresh=0.06, xz_thresh=0.005, high_density=True,
    )
    holding = (tcp_to_obj < 0.035) & (tcp_opened > 0) & (
        obj[2] - 0.01 > state.obj_init_pos[0, 2]
    )
    object_grasped = jnp.where(holding, 1.0, object_grasped)
    reward = reward_utils.hamacher_product(object_grasped, in_place)
    reward = jnp.where(holding, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(target_to_obj < target_radius, 10.0, reward)

    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= target_radius).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=(
            (tcp_opened > 0) & (obj[2] - 0.03 > state.obj_init_pos[0, 2])
        ).astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("basketball-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(kind=2, radius=0.025, half_h=0.03, graspable=True,
                      # the pads pinch the ball below its equator: golden
                      # carries ride the ball's COM +12 mm above the tcp
                      # (canonical grip 0.006 - grasp_off_z)
                      grasp_halfwidth=0.025, mass=0.05,
                      grasp_off=(0.0, 0.0, -0.006))],
        # basket collision shells from the reference hoop model
        # (ref objects/assets/basketballhoop.xml): the BACKBOARD box
        # half (0.1, 0.01, 0.07) at basket+(0,0,0.29) and the pole
        # cylinder r 0.007 spanning z 0.01-0.226. The backboard is what
        # parks the reference claw during the dunk: the golden trace's
        # leftclaw/leftpad press its front face (y = basket_y - 0.01)
        # while the mocap marches 0.15 m past it, and the weld's Coulomb
        # pin holds the tcp there for the rest of the episode.
        boxes=[StaticBox(pos=(0.0, 0.0, 0.29), size=(0.1, 0.01, 0.07),
                         rel_fixture=True),
               StaticBox(pos=(0.0, 0.0, 0.118), size=(0.007, 0.007, 0.108),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="basketball-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.concatenate([_OBJ_LOW, _GOAL_LOW]),
        rand_high=np.concatenate([_OBJ_HIGH, _GOAL_HIGH]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.asarray(_GOAL_SPACE_LOW),
        goal_high=np.asarray(_GOAL_SPACE_HIGH),
        reset_fn=_reset,
        reward_fn=_reward,
        n_obs_obj=1,
        # ref emits the body xquat (wxyz identity at rest)
        quat_style=("wxyz", "wxyz"),
    )
