"""drawer-close-v3: push the open drawer shut.

Ref metaworld/envs/sawyer_drawer_close_v3.py: drawer at rand (x, 0.9, 0);
drawer pulled out maxDist = 0.15 at reset (:60, :76); handle obs at z 0.14;
target = drawer + (0, -0.16, 0.09); _TARGET_RADIUS 0.04, success <= R+0.015.
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

_MAX_DIST = 0.15
# the ref class defines _TARGET_RADIUS=0.04 but reads
# self.TARGET_RADIUS (no underscore) everywhere = base 0.05
# (sawyer_drawer_close_v3.py:16 vs :81,:139-140)
_R = 0.05
_HANDLE_OFF = (0.0, -0.17, 0.14)


def _reset(spec: TaskSpec, rand, rng):
    drawer = rand[:3]
    target = drawer + jnp.array([0.0, -0.16, 0.09])
    handle_open = drawer + jnp.asarray(_HANDLE_OFF) + jnp.array([0.0, -_MAX_DIST, 0.0])
    return dict(
        fixture_pos=drawer,
        target=target,
        obj_init_pos=common.pad_obj_pos(handle_open),
        joint_q=jnp.array([_MAX_DIST, 0.0]),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    quat = common.live_quat(spec, state)  # zeros per the reference
    return handle, quat


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    tcp = state.sim.hand
    target = state.target
    target_to_obj = jnp.linalg.norm(obj - target)
    target_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        target_to_obj, bounds=(0, _R),
        margin=jnp.abs(target_to_obj_init - _R), sigmoid="long_tail",
    )
    handle_reach_radius = 0.005
    tcp_to_obj = jnp.linalg.norm(obj - tcp)
    tcp_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.init_tcp)
    reach = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, handle_reach_radius),
        margin=jnp.abs(tcp_to_obj_init - handle_reach_radius), sigmoid="gaussian",
    )
    gripper_closed = jnp.minimum(jnp.maximum(0.0, action[-1]), 1.0)
    reach = reward_utils.hamacher_product(reach, gripper_closed)
    reward = reward_utils.hamacher_product(reach, in_place)
    reward = jnp.where(target_to_obj <= _R + 0.015, 1.0, reward)
    reward = reward * 10.0
    return common.eval_out(
        reward=reward,
        success=(target_to_obj <= _R + 0.015).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.01).astype(jnp.float32),
        grasp_success=1.0,
        grasp_reward=reach,
        in_place_reward=in_place,
        obj_to_target=target_to_obj,
    )


@registry.register("drawer-close-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            # compiled truth (sawyer_drawer.xml goal_slidey) — see
            # drawer_open_v3.py; same cabinet, drawer starts open
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
        name="drawer-close-v3",
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
        quat_style=("zeros", "zeros"),
        n_obs_obj=1,
    )
