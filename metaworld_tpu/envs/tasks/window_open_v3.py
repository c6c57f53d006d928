"""window-open-v3: slide the window pane open (+x).

Ref metaworld/envs/sawyer_window_open_v3.py: window at rand (x in [-0.1,0.1],
y in [0.7,0.9], 0.16); handle (handleOpenStart site) at window +
(-0.04,-0.095,0); slide range ~0.2 (+x); target = window + (0.2,0,0);
success |handle_x - target_x| <= 0.05 (R=0.05).
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

_R = 0.05
_HANDLE_OFF = (-0.04, -0.095, 0.0)


def _reset(spec: TaskSpec, rand, rng):
    window = rand[:3]
    target = window + jnp.array([0.2, 0.0, 0.0])
    # reference obj_init_pos is the WINDOW BODY (the rand vec); the handle
    # start point only enters the reach margin (window_handle_pos_init)
    return dict(
        fixture_pos=window,
        target=target,
        obj_init_pos=common.pad_obj_pos(window),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    return handle, jnp.zeros((2, 4))


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp = state.sim.hand
    target = state.target
    target_to_obj = jnp.abs(obj[0] - target[0])
    target_to_obj_init = jnp.abs(state.obj_init_pos[0, 0] - target[0])
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, _R),
        margin=jnp.abs(target_to_obj_init - _R), sigmoid="long_tail",
    )
    handle_radius = 0.02
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    handle_init = state.obj_init_pos[0] + jnp.asarray(_HANDLE_OFF)
    tcp_to_obj_init = jnp.linalg.norm(handle_init - state.init_tcp)
    reach = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, handle_radius),
        margin=jnp.abs(tcp_to_obj_init - handle_radius), sigmoid="long_tail",
    )
    reward = 10.0 * reward_utils.hamacher_product(reach, in_place)
    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= _R).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=1.0,
        grasp_reward=reach,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


def make_window_scene(handle_off, press_off_x):
    # compiled truth (sawyer_window_horizontal.xml window_slide): M=0.639,
    # damping=2.0, range (0, 0.2); the graspable handle is a VERTICAL
    # capsule bar (geom47: r=0.008, half-length 0.045 along z) centered at
    # x=-0.014 rel the joint anchor — press_off_x maps the reported site
    # (handleOpenStart -0.04 / handleCloseStart +0.01) onto the bar center
    return build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(1.0, 0.0, 0.0), anchor=handle_off,
            range=(0.0, 0.2), damping=2.0, inertia=0.639, mass=0.638,
            handle_radius=0.008, face_radius=0.045, face_dir=(0.0, 0.0, 1.0),
            press_off=(press_off_x, 0.0, 0.0),
        )],
        boxes=[StaticBox(pos=(0.0, 0.03, 0.0), size=(0.25, 0.02, 0.18),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )


@registry.register("window-open-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="window-open-v3",
        task_id=task_id,
        scene=make_window_scene(_HANDLE_OFF, press_off_x=0.026),
        rand_low=np.array([-0.1, 0.7, 0.16]),
        rand_high=np.array([0.1, 0.9, 0.16]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, 0.05)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        n_obs_obj=1,
    )
