"""coffee-pull-v3: pull the mug out from under the coffee machine.

Ref metaworld/envs/sawyer_coffee_pull_v3.py: mug at rand xy in
[-0.05,0.05]x[0.7,0.75], goal in [-0.1,0.1]x[0.55,0.65]; reject until
|mug-goal| >= 0.15; machine body at mug + (0,0.22,0). v2 reward: xy-scaled
(2,2,1) in_place, base caging (reach 0.04, radius 0.02, xz 0.05, effort
0.7, medium_density); success |obj - target| <= 0.07.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils


def coffee_mug_scene():
    return build_scene(
        # the mug reports its body-frame origin at its BOTTOM (ref
        # get_body_com("obj"); mug.xml geoms at +0.035): physics tracks the
        # true COM (half_h 0.035) and the task's obj_report_off shifts the
        # observation back to the bottom-frame convention
        objs=[FreeObj(radius=0.035, half_h=0.035, graspable=True,
                      grasp_halfwidth=0.033, mass=0.15,
                      # tapered frustum: only a centered pinch holds
                      # (golden coffee-push squeezes at dx >= 15 mm and
                      # the mug squirts out along the pad axis)
                      grasp_x_tol=0.006)],
        # the coffee machine body sits behind the mug slot
        boxes=[StaticBox(pos=(0.0, 0.05, 0.15), size=(0.08, 0.08, 0.15),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )


def make_coffee_reward(success_thresh=0.07):
    def _reward(spec: TaskSpec, state, obs, action):
        obj = obs[4:7]
        target = state.target
        scale = jnp.array([2.0, 2.0, 1.0])
        target_to_obj = jnp.linalg.norm((obj - target) * scale)
        target_to_obj_init = jnp.linalg.norm((state.obj_init_pos[0] - target) * scale)
        in_place = reward_utils.tolerance(
            target_to_obj, bounds=(0, 0.05), margin=target_to_obj_init,
            sigmoid="long_tail",
        )
        tcp_opened = obs[3]
        tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
        object_grasped = gripper_caging_reward(
            spec, state, action, obj,
            object_reach_radius=0.04, obj_radius=0.02,
            pad_success_thresh=0.05, xz_thresh=0.05,
            desired_gripper_effort=0.7, medium_density=True,
        )
        reward = reward_utils.hamacher_product(object_grasped, in_place)
        near = (tcp_to_obj < 0.04) & (tcp_opened > 0)
        reward = jnp.where(near, reward + 1.0 + 5.0 * in_place, reward)
        reward = jnp.where(target_to_obj < 0.05, 10.0, reward)
        obj_to_target_plain = jnp.linalg.norm(obj - target)
        return common.eval_out(
            reward=reward,
            success=(obj_to_target_plain <= success_thresh).astype(jnp.float32),
            near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
            grasp_success=(touching_main_object(state) & (tcp_opened > 0)).astype(jnp.float32),
            grasp_reward=object_grasped,
            in_place_reward=in_place,
            obj_to_target=obj_to_target_plain,
        )
    return _reward


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    mug = jnp.array([rand[0], rand[1], 0.0])
    target = rand[3:6]
    machine = mug + jnp.array([0.0, 0.22, 0.0])
    return dict(
        obj_pos=common.pad_obj_pos(mug + jnp.array([0.0, 0.0, 0.035])),
        obj_init_pos=common.pad_obj_pos(mug),
        target=target,
        fixture_pos=machine,
    )


@registry.register("coffee-pull-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="coffee-pull-v3",
        task_id=task_id,
        scene=coffee_mug_scene(),
        rand_low=np.array([-0.05, 0.7, -0.001, -0.1, 0.55, -0.001]),
        rand_high=np.array([0.05, 0.75, 0.001, 0.1, 0.65, 0.001]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.array([-0.1, 0.55, -0.001]),
        goal_high=np.array([0.1, 0.65, 0.001]),
        obj_report_off=np.array([[0.0, 0.0, -0.035], [0.0, 0.0, 0.0]],
                                np.float32),
        reset_fn=_reset,
        reward_fn=make_coffee_reward(),
        n_obs_obj=1,
    )
