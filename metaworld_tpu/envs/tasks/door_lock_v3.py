"""door-lock-v3: push the door's lock lever down.

Ref metaworld/envs/sawyer_door_lock_v3.py: door at rand (x in [-0.1,0.1],
y in [0.8,0.85], 0.15); lock lever at door + (0.09,-0.158,0.071) traveling
down-left (modeled as a slide along the observed arc chord); target =
lock_init + (0,-0.04,-0.1); _lock_length 0.1 (:53); v2 reward uses the LEFT
PAD as the reach point with scale (0.25,1,0.5); success |target_z - obj_z|
<= 0.02. Note mocap low z = -0.15.
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

_LOCK_OFF = (0.09, -0.158, 0.071)
_LOCK_LEN = 0.1
_AXIS = (-0.551, 0.0, -0.835)  # unit chord of the lever's arc


def _reset(spec: TaskSpec, rand, rng):
    door = rand[:3]
    # the reference's obj_init_pos/target use the lock_link BODY frame
    # (door + (0,-0.118,0.061)), not the observed lever site
    lock_body = door + jnp.array([0.0, -0.118, 0.061])
    target = lock_body + jnp.array([0.0, -0.04, -0.1])
    return dict(
        fixture_pos=door,
        target=target,
        obj_init_pos=common.pad_obj_pos(lock_body),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    quat = common.live_quat(spec, state)
    return handle, quat


def _reward(spec: TaskSpec, state, obs, action):
    obj = obs[4:7]
    left_pad, _ = engine.pad_positions(state.sim)
    scale = jnp.array([0.25, 1.0, 0.5])
    tcp_to_obj = jnp.linalg.norm((obj - left_pad) * scale)
    tcp_to_obj_init = jnp.linalg.norm((obj - left_pad) * scale)  # live view
    obj_to_target = jnp.abs(state.target[2] - obj[2])
    tcp_opened = jnp.maximum(obs[3], 0.0)
    near_lock = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, 0.01), margin=tcp_to_obj_init, sigmoid="long_tail"
    )
    lock_pressed = reward_utils.tolerance(
        obj_to_target, bounds=(0, 0.005), margin=_LOCK_LEN, sigmoid="long_tail"
    )
    reward = 2.0 * reward_utils.hamacher_product(tcp_opened, near_lock)
    reward = reward + 8.0 * lock_pressed
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.02).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.05).astype(jnp.float32),
        grasp_success=(obs[3] > 0).astype(jnp.float32),
        grasp_reward=near_lock,
        in_place_reward=lock_pressed,
        obj_to_target=obj_to_target,
    )


@registry.register("door-lock-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=_AXIS, anchor=_LOCK_OFF,
            range=(0.0, 0.125), damping=6.0, inertia=0.3, handle_radius=0.03,
        )],
        # NB: the compiled door PANEL (g53, hanging 0.10 in front of the
        # door body) is deliberately NOT modeled here — the scripted lock
        # press descends just in front of it, and a rigid panel proxy
        # cost 2/10 closed-loop goals when tried (the reference's soft
        # mesh contact lets the claw brush it). door_unlock_v3.py keeps
        # the panel: its press approaches from below and leans on it.
        boxes=[StaticBox(pos=(0.0, 0.0, 0.0), size=(0.2, 0.02, 0.22),
                         rel_fixture=True)],
        mocap_low=(-0.5, 0.40, -0.15),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="door-lock-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([-0.1, 0.8, 0.15]),
        rand_high=np.array([0.1, 0.85, 0.15]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, -0.15)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # body xquat (wxyz), constant identity at rest
        obj_quat0=None,
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )
