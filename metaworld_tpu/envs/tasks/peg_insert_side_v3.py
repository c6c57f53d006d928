"""peg-insert-side-v3: grasp the peg and insert it sideways into the box hole.

Ref metaworld/envs/sawyer_peg_insertion_side_v3.py: peg at rand xy in
[0,0.2]x[0.5,0.7] (obs COM + (0.03,0,0.01)); box at goal rand in
[-0.35,-0.25]x[0.4,0.7]; reject until |peg-box| >= 0.1; target = box +
(0.03, 0, 0.13); v2 reward: pegHead (obj - (0.13,0,0)) scaled (1,2,2)
in_place, caging radius 0.0075, pad 0.03, high_density, grasp override;
success obj_to_target <= 0.07; collision-box funnel terms exact with the
box's euler-z rotation applied to the corner sites.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

# pegGrasp site local (.03,0,.01) -> pegHead local (-.1,0,0):
# head = obs + (-0.13, 0, -0.01) (assets/sawyer_peg_insertion_side.xml:14-16)
_HEAD_OFF = (-0.13, 0.0, -0.01)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.1

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    peg = jnp.array([rand[0] + 0.03, rand[1], 0.03])
    box = rand[3:6]
    target = box + jnp.array([0.03, 0.0, 0.13])
    head0 = peg + jnp.asarray(_HEAD_OFF)
    # reference obj_init_pos is the peg BODY COM (rand_x, rand_y, 0.02);
    # the pegGrasp obs site sits (+0.03, 0, +0.01) off it. Margins and the
    # lift thresholds key off the com (sawyer_peg_insertion_side_v3.py).
    peg_com = jnp.array([rand[0], rand[1], 0.02])
    return dict(
        obj_pos=common.pad_obj_pos(peg),
        obj_init_pos=common.pad_obj_pos(peg_com),
        target=target,
        fixture_pos=box,
        extras=common.extras_vec(head0[0], head0[1], head0[2]),
    )


def _reward(spec: TaskSpec, state, obs, action):
    tcp = state.sim.hand
    obj = obs[4:7]
    obj_head = obj + jnp.asarray(_HEAD_OFF)
    tcp_opened = obs[3]
    target = state.target
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    scale = jnp.array([1.0, 2.0, 2.0])
    obj_to_target = jnp.linalg.norm((obj_head - target) * scale)
    # peg_head_pos_init is read BEFORE _set_obj_xyz (ref reset_model:143),
    # i.e. the XML-default peg (0, 0.6, 0.03) settled onto the table during
    # _reset_hand: head = (-0.1, 0.6, 0.015) — constant across resets
    head_init = jnp.array([-0.1, 0.6, 0.015])
    in_place_margin = jnp.linalg.norm((head_init - target) * scale)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.07), margin=in_place_margin,
        sigmoid="long_tail",
    )
    # collision-box shaping (ref :189-203): two rect prisms anchored to the
    # box body (sites in assets/objects/assets/peg_block.xml:13-16) funnel
    # the peg head into the hole mouth
    # the box body carries euler="0 0 1.57" (the xml above), so site
    # locals map (x, y, z) -> (-y, x, z) in world
    box = target - jnp.array([0.03, 0.0, 0.13])
    cb1 = reward_utils.rect_prism_tolerance(
        obj_head, zero=box + jnp.array([0.11, 0.1, 0.01]),
        one=box + jnp.array([0.15, -0.1, 0.096]))
    cb2 = reward_utils.rect_prism_tolerance(
        obj_head, zero=box + jnp.array([0.11, 0.1, 0.16]),
        one=box + jnp.array([0.17, -0.1, 0.19]))
    collision_boxes = reward_utils.hamacher_product(cb2, cb1)
    in_place = reward_utils.hamacher_product(in_place, collision_boxes)
    object_grasped = gripper_caging_reward(
        spec, state, action, obj,
        object_reach_radius=0.01, obj_radius=0.0075,
        pad_success_thresh=0.03, xz_thresh=0.005, high_density=True,
    )
    holding = (tcp_to_obj < 0.08) & (tcp_opened > 0) & (
        obj[2] - 0.01 > state.obj_init_pos[0, 2]
    )
    object_grasped = jnp.where(holding, 1.0, object_grasped)
    reward = reward_utils.hamacher_product(object_grasped, in_place)
    reward = jnp.where(holding, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(obj_to_target <= 0.07, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.07).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
        grasp_success=(
            touching_main_object(state)
            & (tcp_opened > 0)
            & (obj[2] - 0.02 > state.obj_init_pos[0, 2])
        ).astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=obj_to_target,
    )


@registry.register("peg-insert-side-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        objs=[FreeObj(radius=0.018, half_h=0.03, graspable=True,
                      grasp_halfwidth=0.015)],
        # the peg block's collision shell (peg_block.xml:5-11, euler-z 90
        # mount: local (x,y,z) -> world (-y,x,z)): base, upper lip, and
        # the two flanks framing the hole mouth (y in [-0.03,0.03],
        # z in [0.10,0.16] rel box)
        boxes=[
            StaticBox(pos=(0.0, 0.0, 0.05), size=(0.096, 0.09, 0.05),
                      rel_fixture=True),
            StaticBox(pos=(0.0, 0.0, 0.185), size=(0.098, 0.09, 0.025),
                      rel_fixture=True),
            StaticBox(pos=(0.0, 0.06, 0.13), size=(0.096, 0.03, 0.03),
                      rel_fixture=True),
            StaticBox(pos=(0.0, -0.06, 0.13), size=(0.096, 0.03, 0.03),
                      rel_fixture=True),
        ],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="peg-insert-side-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([0.0, 0.5, 0.02, -0.35, 0.4, -0.001]),
        rand_high=np.array([0.2, 0.7, 0.02, -0.25, 0.7, 0.001]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.32, 0.4, 0.1289]),
        goal_high=np.array([-0.22, 0.7, 0.1311]),
        reset_fn=_reset,
        reward_fn=_reward,
        n_obs_obj=1,
    )
