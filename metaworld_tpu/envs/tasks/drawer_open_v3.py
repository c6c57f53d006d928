"""drawer-open-v3: hook the drawer handle and pull it open.

Ref metaworld/envs/sawyer_drawer_open_v3.py: drawer at rand (x in [-0.1,0.1],
0.9, 0); handle at drawer + (0,-0.17,0.09); target = drawer +
(0, -0.16-maxDist, 0.09), maxDist = 0.2 (:58); v2 reward (:95-130) uses the
hand body (obs[:3]) with xy-scaled caging; success handle_error <= 0.03.
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

_MAX_DIST = 0.2
_HANDLE_OFF = (0.0, -0.17, 0.09)


def _reset(spec: TaskSpec, rand, rng):
    drawer = rand[:3]
    target = drawer + jnp.array([0.0, -0.16 - _MAX_DIST, 0.09])
    handle = drawer + jnp.asarray(_HANDLE_OFF)
    return dict(
        fixture_pos=drawer,
        target=target,
        obj_init_pos=common.pad_obj_pos(handle),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    quat = common.live_quat(spec, state)
    return handle, quat


def _reward(spec: TaskSpec, state, obs, action):
    gripper = obs[:3]
    handle = obs[4:7]
    handle_error = jnp.linalg.norm(handle - state.target)
    reward_for_opening = reward_utils.tolerance(
        handle_error, bounds=(0, 0.02), margin=_MAX_DIST, sigmoid="long_tail"
    )
    handle_pos_init = state.target + jnp.array([0.0, _MAX_DIST, 0.0])
    scale = jnp.array([3.0, 3.0, 1.0])
    gripper_error = (handle - gripper) * scale
    gripper_error_init = (handle_pos_init - state.init_tcp) * scale
    reward_for_caging = reward_utils.tolerance(
        jnp.linalg.norm(gripper_error),
        bounds=(0, 0.01),
        margin=jnp.linalg.norm(gripper_error_init),
        sigmoid="long_tail",
    )
    reward = 5.0 * (reward_for_caging + reward_for_opening)
    return common.eval_out(
        reward=reward,
        success=(handle_error <= 0.03).astype(jnp.float32),
        near_object=(jnp.linalg.norm(handle - gripper) <= 0.03
                     ).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=reward_for_caging,
        in_place_reward=reward_for_opening,
        obj_to_target=handle_error,
    )


@registry.register("drawer-open-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            # compiled truth (sawyer_drawer.xml goal_slidey): M=0.381,
            # damping=2.0, throw 0.16, subtree mass 0.38 (y-slide: no
            # gravity). The handle is a BAR along x (geom50 capsule
            # r=0.009, half-length 0.05) 0.01 behind the reported point —
            # the open claw descends around it to hook
            kind=JointType.SLIDE, axis=(0.0, -1.0, 0.0), anchor=_HANDLE_OFF,
            range=(0.0, 0.16), damping=2.0, inertia=0.381, mass=0.38,
            handle_radius=0.009, face_radius=0.05, face_dir=(1.0, 0.0, 0.0),
            press_off=(0.0, 0.01, 0.0),
        )],
        boxes=[StaticBox(pos=(0.0, 0.01, 0.084), size=(0.12, 0.13, 0.084),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="drawer-open-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([-0.1, 0.9, 0.0]),
        rand_high=np.array([0.1, 0.9, 0.0]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
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
