"""button-press-wall-v3: press the button horizontally, wall in the way.

Contract from ref metaworld/envs/sawyer_button_press_wall_v3.py: same
buttonbox as button-press-v3 with a wall between hand and box; v2 reward:
near_button bounds (0, 0.01); staged — far (tcp_to_obj > 0.07):
2*hamacher((1-obs3)/2, near_button); close: 2 + 2*(1+obs3) +
4*button_pressed^2; success |target_y - obj_y| <= 0.03.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FixtureJoint, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.envs.tasks.button_press_v3 import _BTN_OFF, _TARGET_OFF_Y, _obs
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_OBJ_LOW = (-0.05, 0.85, 0.1149)
_OBJ_HIGH = (0.05, 0.9, 0.1151)


def _reset(spec: TaskSpec, rand, rng):
    box = rand[:3]
    target = box + jnp.array([0.0, _TARGET_OFF_Y, 0.0])
    start = box + jnp.asarray(_BTN_OFF)
    return dict(
        fixture_pos=box,
        target=target,
        obj_init_pos=common.pad_obj_pos(start),
        extras=common.extras_vec(jnp.abs(target[1] - start[1])),
    )


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp = state.sim.hand
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    tcp_to_obj_init = jnp.linalg.norm(obj - state.init_tcp)
    obj_to_target = jnp.abs(state.target[1] - obj[1])
    near_button = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, 0.01), margin=tcp_to_obj_init, sigmoid="long_tail"
    )
    button_pressed = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.005), margin=state.extras[0], sigmoid="long_tail"
    )
    tcp_status = (1.0 - obs[3]) / 2.0
    far_reward = 2.0 * reward_utils.hamacher_product(tcp_status, near_button)
    close_reward = 2.0 + 2.0 * (1.0 + obs[3]) + 4.0 * jnp.square(button_pressed)
    reward = jnp.where(tcp_to_obj > 0.07, far_reward, close_reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.03).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=near_button,
        in_place_reward=button_pressed,
        obj_to_target=obj_to_target,
    )


@registry.register("button-press-wall-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(0.0, 1.0, 0.0), anchor=_BTN_OFF,
            # effective stop 0.0695, NOT the plain button's 0.086: the
            # declared range is [-0.06, 0] with a SOFT limit (buttonbox.xml
            # btnbox_joint) and the park depth scales with press force —
            # the wall caps the claw's approach here, and the golden wall
            # press bottoms at +0.0695 (vs 0.086 on the unwalled button)
            range=(0.0, 0.0695), damping=1.0, stiffness=0.5, springref=-0.5,
            inertia=0.011, mass=0.01, com=(0.0, -0.1935, 0.0),
            handle_radius=0.0, face_radius=0.0425,
        )],
        boxes=[
            StaticBox(pos=(0.0, 0.012, 0.0), size=(0.12, 0.102, 0.115), rel_fixture=True, blocks_hand=False),
            # compiled truth: wall body at y=0.6 (NOT the 0.75 of the
            # reach/push walls), box half (0.1, 0.01, 0.075)
            StaticBox(pos=(0.1, 0.6, 0.075), size=(0.1, 0.01, 0.075)),
        ],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="button-press-wall-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.asarray(_OBJ_LOW),
        rand_high=np.asarray(_OBJ_HIGH),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, 0.05)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
