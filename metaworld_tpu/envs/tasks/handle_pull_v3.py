"""handle-pull-v3: grab the box handle and pull it up.

Ref metaworld/envs/sawyer_handle_pull_v3.py: box at rand (x in [-0.1,0.1],
y in [0.8,0.9], 0); handle starts pulled down (q=-0.1) — obs at box +
(0.05,-0.216,0.063); target (goalPull) at box + (0,-0.216,0.172); base
caging (radius 0.022, xz 0.01, high_density); success target_to_obj
(z) <= 0.05; grasp bonus uses the reference's obj[1] vs obj_init[2] quirk.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward
from metaworld_tpu.envs.scene_builder import FixtureJoint, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.envs.tasks.handle_press_v3 import handle_boxes, handle_obs
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_R = 0.05


def make_pull_scene(handle_off, hi=0.02, side=False):
    # compiled truth (sawyer_handle_press.xml jnt9): M=0.003, damping=30,
    # mass 0.002; pull overpress past the 0.0 stop observed to +0.019
    # (handle-pull) / +0.069 (handle-pull-side) in the golden traces
    return build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(0.0, 0.0, 1.0), anchor=handle_off,
            range=(-0.105, hi), damping=30.0, inertia=0.003, mass=0.002,
            handle_radius=0.022, face_radius=0.07,
            face_dir=(0.0, 1.0, 0.0) if side else (1.0, 0.0, 0.0),
            press_off=(-0.05, 0.0, -0.014) if not side else (0.046, 0.0, 0.0),
            hookable=True,
        )],
        boxes=handle_boxes(side),
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )


def _reset(spec: TaskSpec, rand, rng):
    box = rand[:3]
    handle0 = box + jnp.array([0.05, -0.216, 0.163]) + jnp.array([0.0, 0.0, -0.1])
    target = box + jnp.array([0.0, -0.216, 0.172])
    del handle0  # obs point; the reference's obj_init_pos is the BOX body
    return dict(
        fixture_pos=box,
        target=target,
        obj_init_pos=common.pad_obj_pos(box),
        joint_q=jnp.array([-0.1, 0.0]),
    )


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    target = state.target
    target_to_obj = jnp.abs(target[2] - obj[2])
    target_to_obj_init = jnp.abs(target[2] - state.obj_init_pos[0, 2])
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, _R), margin=target_to_obj_init,
        sigmoid="long_tail",
    )
    object_grasped = gripper_caging_reward(
        spec, state, action, obj,
        pad_success_thresh=0.05, obj_radius=0.022,
        object_reach_radius=0.01, xz_thresh=0.01, high_density=True,
    )
    reward = reward_utils.hamacher_product(object_grasped, in_place)
    tcp_opened = obs[3]
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    # the reference compares obj[1] (y!) against obj_init z — kept verbatim
    bonus = (tcp_to_obj < 0.035) & (tcp_opened > 0) & (
        obj[1] - 0.01 > state.obj_init_pos[0, 2]
    )
    reward = jnp.where(bonus, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(target_to_obj < _R, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= _R).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("handle-pull-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="handle-pull-v3",
        task_id=task_id,
        scene=make_pull_scene((0.05, -0.216, 0.163)),
        rand_low=np.array([-0.1, 0.8, -0.001]),
        rand_high=np.array([0.1, 0.9, 0.001]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.1, 0.55, 0.04]),
        goal_high=np.array([0.1, 0.70, 0.18]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=handle_obs,
        n_obs_obj=1,
    )
