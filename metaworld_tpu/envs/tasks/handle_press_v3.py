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


def handle_boxes(side: bool):
    """The hdlprs body's collision shells (compiled sawyer_handle_press.xml):
    two tall side plates, a center wedge, and a small base pad near the
    table. The volume in FRONT of the machine (under the protruding bar) is
    OPEN — the reference hand descends beside the bar to the table. The
    sideways variant is the same body yawed +90 deg."""
    raw = [((0.0605, 0.0062, 0.1036), (0.0259, 0.1467, 0.1555)),
           ((-0.0605, 0.0062, 0.1036), (0.0259, 0.1467, 0.1555)),
           ((0.0, 0.0286, 0.1084), (0.0348, 0.0881, 0.1156)),
           ((0.0, -0.082, 0.014), (0.035, 0.028, 0.014))]
    out = []
    for pos, size in raw:
        if side:
            pos = (-pos[1], pos[0], pos[2])
            size = (size[1], size[0], size[2])
        out.append(StaticBox(pos=pos, size=size, rel_fixture=True))
    return out


def make_handle_scene(handle_off, press: bool, hi=0.16, side=False):
    # compiled truth (sawyer_handle_press.xml jnt9): M=0.003, damping=30,
    # subtree mass 0.002 (gravity sag 0.65 mm/s terminal — effectively
    # static, matching the released handle's slow droop in the golden
    # traces); range throw 0.1 with soft-limit overpress to ~0.16 observed.
    # The handle is a capsule BAR (geom45 cylinder r=0.022 hl=0.07, along x
    # for the front machine / y for the sideways one); the reported handle
    # point (handleStart site) sits ON TOP of the bar, bar center 0.022
    # below it. Modeling the bar (not a disc) matters: a disc face traps
    # the claw underneath during lateral approaches.
    lo, hi = ((0.0, hi) if press else (-0.105, hi))
    return build_scene(
        joints=[FixtureJoint(
            kind=JointType.SLIDE, axis=(0.0, 0.0, -1.0) if press else (0.0, 0.0, 1.0),
            anchor=handle_off, range=(lo, hi), damping=30.0, inertia=0.003,
            mass=0.002, handle_radius=0.022, face_radius=0.07,
            face_dir=(0.0, 1.0, 0.0) if side else (1.0, 0.0, 0.0),
            press_off=(0.0, 0.0, -0.022),
            hookable=not press,
        )],
        boxes=handle_boxes(side),
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
