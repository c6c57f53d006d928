"""door-open-v3: grab the door handle and pull the door open.

Ref metaworld/envs/sawyer_door_v3.py: door at rand (x in [0,0.1], y in
[0.85,0.9], 0.15); hinge geometry from the compiled reference model
(doorlockB.xml: door_link at door + (-0.185, -0.1, 0), hinge axis z,
range [-2, 0]; "handle" geom compiled local pos (0.3757, -0.1071, 0)
after MuJoCo's mesh recentering); target = door + (-0.3, -0.45, 0);
v2 reward (:104-175):
funnel-floor caging + staged opening on the hinge angle; success
|handle_x - target_x| <= 0.08.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FixtureJoint, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.physics import engine
from metaworld_tpu.rewards import utils as reward_utils
from metaworld_tpu.types import JointType

_PIVOT = (-0.185, -0.1, 0.0)
_ARM = (0.375722, -0.10714, 0.0)


def _reset(spec: TaskSpec, rand, rng):
    door = rand[:3]
    target = door + jnp.array([-0.3, -0.45, 0.0])
    handle0 = door + jnp.asarray(_PIVOT) + jnp.asarray(_ARM)
    return dict(
        fixture_pos=door,
        target=target,
        obj_init_pos=common.pad_obj_pos(handle0),
    )


def _obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    return handle, common.live_quat(spec, state)


def _reward(spec: TaskSpec, state, obs, action):
    theta = state.sim.joint_q[0]
    reward_grab = (jnp.clip(action[3], -1.0, 1.0) + 1.0) / 2.0

    hand = obs[:3]
    door = obs[4:7] + jnp.array([-0.05, 0.0, 0.0])
    threshold = 0.12
    radius = jnp.linalg.norm(hand[:2] - door[:2])
    floor = jnp.where(
        radius <= threshold,
        0.0,
        0.04 * jnp.log(jnp.maximum(radius - threshold, 1e-12)) + 0.4,
    )
    above_floor = jnp.where(
        hand[2] >= floor,
        1.0,
        reward_utils.tolerance(
            floor - hand[2], bounds=(0.0, 0.01),
            margin=jnp.maximum(floor / 2.0, 1e-6), sigmoid="long_tail",
        ),
    )
    in_place = reward_utils.tolerance(
        jnp.linalg.norm(hand - door - jnp.array([0.05, 0.03, -0.01])),
        bounds=(0, threshold / 2.0), margin=0.5, sigmoid="long_tail",
    )
    ready_to_open = reward_utils.hamacher_product(above_floor, in_place)
    door_angle = -theta
    a, b = 0.2, 0.8
    opened = a * (theta < -jnp.pi / 90.0) + b * reward_utils.tolerance(
        jnp.pi / 2.0 + jnp.pi / 6 - door_angle,
        bounds=(0, 0.5), margin=jnp.pi / 3.0, sigmoid="long_tail",
    )
    reward = 2.0 * reward_utils.hamacher_product(ready_to_open, reward_grab) + 8.0 * opened
    success = jnp.abs(obs[4] - state.target[0]) <= 0.08
    reward = jnp.where(success, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=success.astype(jnp.float32),
        near_object=ready_to_open,
        grasp_success=(reward_grab >= 0.5).astype(jnp.float32),
        grasp_reward=reward_grab,
        in_place_reward=opened,
        obj_to_target=0.0,
    )


@registry.register("door-open-v3")
def make_spec(task_id: int) -> TaskSpec:
    scene = build_scene(
        joints=[FixtureJoint(
            kind=JointType.HINGE, axis=(0.0, 0.0, 1.0), anchor=_PIVOT, arm=_ARM,
            # compiled truth (sawyer_door_pull.xml doorjoint): M=0.151,
            # damping=2.0, subtree mass 2.23 (z-hinge: no gravity torque).
            # The handle is a VERTICAL bar (handle mesh bbox half-z 0.097,
            # r ~= 0.023) — a capsule press face, so an approaching claw
            # only shoves the door by its true geometric overlap (a wide
            # disc face made every near miss a full-depth phantom press
            # that slammed the door to its stop)
            # open stop at -1.785, NOT the declared joint range -2.0: the
            # door slab strikes the doorlockB housing (live-model contact
            # door_link g51 x doorlockB g37 at q = -1.78) and parks there
            # under full weld pull in the golden trace
            range=(-1.785, 0.0), damping=2.0, inertia=0.151, mass=2.23,
            handle_radius=0.023, face_radius=0.097, face_dir=(0.0, 0.0, 1.0),
            hookable=True, panel=True, panel_off=0.12,
        )],
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name="door-open-v3",
        task_id=task_id,
        scene=scene,
        rand_low=np.array([0.0, 0.85, 0.15]),
        rand_high=np.array([0.1, 0.95, 0.15]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.3, 0.4, 0.1499]),
        goal_high=np.array([-0.2, 0.5, 0.1501]),
        reset_fn=_reset,
        reward_fn=_reward,
        obs_fn=_obs,
        # handle geom xmat -> scipy xyzw (ref sawyer_door_v3.py); the door
        # body rotates with the hinge, so the quat composes R(z, joint_q)
        obj_quat0=np.array([[0.151, 0.691, -0.151, 0.691],
                            [1.0, 0.0, 0.0, 0.0]]),
        quat_style=("xyzw", "xyzw"),
        quat_joint=(0, -1),
        n_obs_obj=1,
    )
