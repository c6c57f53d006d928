"""soccer-v3: kick/push the ball into the goal box.

Contract from ref metaworld/envs/sawyer_soccer_v3.py: obj (x,y,0.03) in
[-0.1,0.1]x[0.6,0.7], goal xy in [-0.1,0.1]x[0.8,0.9] z=0; resample until
|obj_xy-goal_xy| >= 0.15; the goal frame body moves to the target per reset.
v2 reward (:231-268): x-scaled (3,1,1) in_place with an offside penalty past
the goal line, grip-variant caging (radius 0.013, grip +0.01, xz 0.005);
reward = 3*grasp + 6.5*in_place; success |obj-target| <= 0.07 (unscaled).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec, gripper_caging_reward_grip, touching_main_object
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils

_OBJ_LOW = (-0.1, 0.6, 0.03)
_OBJ_HIGH = (0.1, 0.7, 0.03)
_GOAL_LOW = (-0.1, 0.8, 0.0)
_GOAL_HIGH = (0.1, 0.9, 0.0)


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    obj = jnp.array([rand[0], rand[1], 0.03])
    target = rand[3:6]
    return dict(
        obj_pos=common.pad_obj_pos(obj),
        obj_init_pos=common.pad_obj_pos(obj),
        target=target,
        fixture_pos=target,  # the goal frame body follows the target
    )


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp_opened = obs[3]
    x_scaling = jnp.array([3.0, 1.0, 1.0])
    tcp_to_obj = jnp.linalg.norm(obj - state.sim.hand)
    target_to_obj = jnp.linalg.norm((obj - state.target) * x_scaling)
    # NB the reference computes the margin against the CURRENT obj pos
    # (obj - obj_init), not target - init (sawyer_soccer_v3.py:238-240)
    target_to_obj_init = jnp.linalg.norm((obj - state.obj_init_pos[0]) * x_scaling)

    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, 0.07), margin=target_to_obj_init,
        sigmoid="long_tail",
    )
    goal_line = state.target[1] - 0.1
    offside = (obj[1] > goal_line) & (jnp.abs(obj[0] - state.target[0]) > 0.10)
    in_place = jnp.where(
        offside,
        jnp.clip(in_place - 2.0 * ((obj[1] - goal_line) / (1.0 - goal_line)), 0.0, 1.0),
        in_place,
    )
    object_grasped = gripper_caging_reward_grip(
        spec, state, action, obj, obj_radius=0.013,
        grip_margin_add=0.01, xz_margin=0.005,
    )
    reward = 3.0 * object_grasped + 6.5 * in_place
    reward = jnp.where(target_to_obj < 0.07, 10.0, reward)

    obj_to_target_plain = jnp.linalg.norm(obj - state.target)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target_plain <= 0.07).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
        grasp_success=(
            touching_main_object(state)
            & (tcp_opened > 0)
            & (obj[2] - 0.02 > state.obj_init_pos[0, 2])
        ).astype(jnp.float32),
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=obj_to_target_plain,
    )


@registry.register("soccer-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        # the reference's scripted play never grasps the ball (grasp_success
        # is 0 across all golden traces): it is kicked/pushed only.
        # friction 2.5 is the calibrated EFFECTIVE stopping rate of the
        # kicked ball: in the reference the fingers drag the ball as the
        # kick ends (the decelerating claw stays in rolling contact), so
        # the ball stops ~3x faster than table Coulomb alone — matching
        # the golden post-kick coast distance (ref ball stops in 2.5 cm
        # from 0.8 m/s; table mu=1 alone would coast 4.3 cm)
        objs=[FreeObj(kind=2, radius=0.026, half_h=0.026, graspable=False, friction=2.5,
                      grasp_halfwidth=0.026, mass=0.05)],
        # goal frame: back net + posts catch the ball (the fixture base is
        # moved to the sampled goal at reset)
        # thin goal frame: the ball bounces off it, but the claw sweeping
        # a kick must not snag on centimeter-wide posts the real fingers
        # slip past (blocks_hand off)
        boxes=[
            # goal frame from the compiled reference collision meshes
            # (goal_col1-4 aabbs): posts at x = +-0.096 (half y 0.062,
            # z to 0.17), a front-top bar between them at knuckle height
            # (the golden post-kick hand parks against it at tcp y ~
            # goal_y - 0.027 — the bar stops the HAND while the ball
            # passes under), and the net back wall
            StaticBox(pos=(0.0, 0.09, 0.05), size=(0.105, 0.01, 0.05),
                      rel_fixture=True, blocks_hand=False),
            StaticBox(pos=(-0.096, -0.012, 0.085), size=(0.008, 0.062, 0.085),
                      rel_fixture=True),
            StaticBox(pos=(0.096, -0.012, 0.085), size=(0.008, 0.062, 0.085),
                      rel_fixture=True),
            StaticBox(pos=(0.0, 0.0, 0.15), size=(0.105, 0.03, 0.025),
                      rel_fixture=True),
        ],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="soccer-v3",
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
