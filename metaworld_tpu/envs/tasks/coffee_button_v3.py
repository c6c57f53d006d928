"""coffee-button-v3: press the coffee machine's brew button.

Contract from ref metaworld/envs/sawyer_coffee_button_v3.py: machine body at
rand (x in [-0.1,0.1], y in [0.8,0.9], z~0); button (obs) at machine +
(0, -0.2204, 0.2993), pressed along +y with max_dist 0.03; target y =
machine_y - 0.22 + 0.03. v2 reward: 2*hamacher(tcp_closed, near_button(0.05))
+ 8*button_pressed (margin = max_dist) gated tcp_to_obj <= 0.05;
success |target_y - obj_y| <= 0.02.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FixtureJoint, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_OBJ_LOW = (-0.1, 0.8, -0.001)
_OBJ_HIGH = (0.1, 0.9, 0.001)
_BTN_OFF = (0.0, -0.2204, 0.2993)
_MAX_DIST = 0.03


def _reset(spec: TaskSpec, rand, rng):
    machine = rand[:3]
    start = machine + jnp.asarray(_BTN_OFF)
    target = machine + jnp.array([0.0, -0.22 + _MAX_DIST, 0.3])
    return dict(
        fixture_pos=machine,
        target=target,
        obj_init_pos=common.pad_obj_pos(start),
        extras=common.extras_vec(_MAX_DIST),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    quat = common.live_quat(spec, state)
    return handle, quat


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp = state.sim.hand
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    tcp_to_obj_init = jnp.linalg.norm(obj - state.init_tcp)
    obj_to_target = jnp.abs(state.target[1] - obj[1])
    tcp_closed = jnp.maximum(obs[3], 0.0)
    near_button = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, 0.05), margin=tcp_to_obj_init, sigmoid="long_tail"
    )
    button_pressed = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.005), margin=state.extras[0], sigmoid="long_tail"
    )
    reward = 2.0 * reward_utils.hamacher_product(tcp_closed, near_button)
    reward = jnp.where(tcp_to_obj <= 0.05, reward + 8.0 * button_pressed, reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.02).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=near_button,
        in_place_reward=button_pressed,
        obj_to_target=obj_to_target,
    )


@registry.register("coffee-button-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(0.0, 1.0, 0.0), anchor=_BTN_OFF,
            range=(0.0, 0.063), damping=1.0, stiffness=0.0, springref=0.0,
            inertia=0.101, mass=0.1, com=(0.0, -0.19, 0.3),
            handle_radius=0.029, face_radius=0.032,
        )],
        # coffee machine collision shell from the COMPILED reference model
        # (sawyer_coffee.xml cm_link geoms, machine body at rand): base
        # column y-front at machine-0.098, dispenser-head frame (top and
        # bottom slabs + side blocks around the button bore) protruding to
        # machine-0.183 — the golden press parks the leading claw 6.7 mm
        # into the bottom slab's front face while the knuckle-height hand
        # mesh presses the cap (obs-hand standoff 41.2 mm = our knuckle
        # r_sum 0.029+0.012)
        boxes=[
            StaticBox(pos=(0.0, 0.0, 0.115), size=(0.1, 0.098, 0.115),
                      rel_fixture=True),
            StaticBox(pos=(0.0, 0.0, 0.3), size=(0.1, 0.098, 0.07),
                      rel_fixture=True),
            StaticBox(pos=(0.0, -0.133, 0.248), size=(0.1, 0.05, 0.018),
                      rel_fixture=True),
            StaticBox(pos=(0.0, -0.133, 0.352), size=(0.1, 0.05, 0.018),
                      rel_fixture=True),
            StaticBox(pos=(-0.069, -0.133, 0.3), size=(0.031, 0.05, 0.035),
                      rel_fixture=True),
            StaticBox(pos=(0.069, -0.133, 0.3), size=(0.031, 0.05, 0.035),
                      rel_fixture=True),
        ],
        mocap_low=(-0.5, 0.4, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="coffee-button-v3",
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
        # body xquat (wxyz), constant identity at rest
        obj_quat0=None,
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
