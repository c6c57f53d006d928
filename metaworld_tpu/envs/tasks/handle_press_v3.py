"""handle-press-v3: press the box handle lever down.

Ref metaworld/envs/sawyer_handle_press_v3.py: box at rand (x in [-0.1,0.1],
y in [0.8,0.9], 0); handle (handleStart) at box + (0,-0.216,0.171) sliding
down; target (goalPress) at box + (0,-0.216,0.075); R=0.02;
success |handle_z - target_z| <= R.
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

_R = 0.02


def make_handle_scene(handle_off, press: bool):
    lo, hi = ((0.0, 0.16) if press else (-0.105, 0.03))
    return build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(0.0, 0.0, -1.0) if press else (0.0, 0.0, 1.0),
            anchor=handle_off, range=(lo, hi), damping=10.0, inertia=0.4,
            handle_radius=0.035, hookable=not press,
            bias=0.0 if press else -2.0,
        )],
        boxes=[StaticBox(pos=(0.0, 0.0, 0.06), size=(0.09, 0.09, 0.06),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )


def press_reset(handle_off, target_off):
    def _reset(spec: TaskSpec, rand, rng):
        box = rand[:3]
        handle = box + jnp.asarray(handle_off)
        target = box + jnp.asarray(target_off)
        return dict(
            fixture_pos=box,
            target=target,
            obj_init_pos=common.pad_obj_pos(handle),
        )
    return _reset


def handle_obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    return handle, jnp.zeros((2, 4))


def press_reward(spec: TaskSpec, state, obs, action):
    """Shared press reward (ref sawyer_handle_press_v3.py:96-136)."""
    obj = obs[4:7]
    tcp = state.sim.hand
    target = state.target
    target_to_obj = jnp.abs(obj[2] - target[2])
    target_to_obj_init = jnp.abs(state.obj_init_pos[0, 2] - target[2])
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, _R),
        margin=jnp.abs(target_to_obj_init - _R), sigmoid="long_tail",
    )
    handle_radius = 0.02
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    tcp_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.init_tcp)
    reach = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, handle_radius),
        margin=jnp.abs(tcp_to_obj_init - handle_radius), sigmoid="long_tail",
    )
    reward = reward_utils.hamacher_product(reach, in_place)
    reward = jnp.where(target_to_obj <= _R, 1.0, reward)
    reward = reward * 10.0
    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= _R).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=1.0,
        grasp_reward=reach,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("handle-press-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="handle-press-v3",
        task_id=task_id,
        scene=make_handle_scene((0.0, -0.216, 0.171), press=True),
        rand_low=np.array([-0.1, 0.8, -0.001]),
        rand_high=np.array([0.1, 0.9, 0.001]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.1, 0.55, 0.04]),
        goal_high=np.array([0.1, 0.70, 0.08]),
        reset_fn=press_reset((0.0, -0.216, 0.171), (0.0, -0.216, 0.075)),
        reward_fn=press_reward,
        obs_fn=handle_obs,
        n_obs_obj=1,
    )
