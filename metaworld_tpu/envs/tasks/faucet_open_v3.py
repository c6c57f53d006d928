"""faucet-open-v3: rotate the faucet handle counter-clockwise (+x side).

Ref metaworld/envs/sawyer_faucet_open_v3.py: base at rand (x in
[-0.05,0.05], y in [0.8,0.85], 0); handle arm (-0.015,-0.175,0.114) rotating
about +z; target = base + (0.175, 0, 0.125); _target_radius 0.07;
reward obj += (-0.04, 0, 0.03) offset.
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

_R = 0.07


def faucet_obs(spec: TaskSpec, state):
    handle = engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    )
    quat = common.live_quat(spec, state)
    return handle, quat


def make_faucet_reward(obj_offset):
    off = jnp.asarray(obj_offset)

    def _reward(spec: TaskSpec, state, obs, action):
        obj = obs[4:7] + off
        tcp = state.sim.hand
        target = state.target
        target_to_obj = jnp.linalg.norm(obj - target)
        target_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - target)
        in_place = reward_utils.tolerance(
            target_to_obj, bounds=(0, _R),
            margin=jnp.abs(target_to_obj_init - _R), sigmoid="long_tail",
        )
        faucet_reach_radius = 0.01
        tcp_to_obj = jnp.linalg.norm(obj - tcp)
        tcp_to_obj_init = jnp.linalg.norm(state.obj_init_pos[0] - state.init_tcp)
        reach = reward_utils.tolerance(
            tcp_to_obj, bounds=(0, faucet_reach_radius),
            margin=jnp.abs(tcp_to_obj_init - faucet_reach_radius), sigmoid="gaussian",
        )
        reward = 2.0 * (2.0 * reach + 3.0 * in_place)
        reward = jnp.where(target_to_obj <= _R, 10.0, reward)
        return common.eval_out(
            reward=reward,
            success=(target_to_obj <= 0.07).astype(jnp.float32),
            near_object=(tcp_to_obj <= 0.01).astype(jnp.float32),
            grasp_success=1.0,
            grasp_reward=reach,
            in_place_reward=in_place,
            obj_to_target=target_to_obj,
        )

    return _reward


def make_faucet_spec(name, task_id, obj_low, obj_high, ccw: bool, obj_offset,
                     arm_x: float):
    def _reset(spec: TaskSpec, rand, rng):
        base = rand[:3]
        sign = 1.0 if ccw else -1.0
        target = base + jnp.array([sign * 0.175, 0.0, 0.125])
        handle0 = base + jnp.array([arm_x, -0.175, 0.114])
        return dict(
            fixture_pos=base,
            target=target,
            # the reference's margins use the BASE position as obj_init
            obj_init_pos=common.pad_obj_pos(base),
            extras=common.extras_vec(),
        )

    scene = build_scene(
        # the faucet column (faucet.xml:5-6: base disc + riser the handle
        # swings around) — the reference claw is deflected by it
        boxes=[StaticBox(pos=(0.0, 0.0, 0.062), size=(0.018, 0.018, 0.062),
                         rel_fixture=True)],
        joints=[FixtureJoint(
            kind=JointType.HINGE,
            axis=(0.0, 0.0, 1.0) if ccw else (0.0, 0.0, -1.0),
            anchor=(0.0, 0.0, 0.0),
            arm=(arm_x, -0.175, 0.114),
            range=(-0.2, 2.0), damping=2.0, inertia=0.15,
            # the handle is a radial capsule bar (faucet.xml:14: r 0.017,
            # half-len 0.055 centered 0.12 from the pivot): face_dir along
            # the arm makes it a SOLID bar the claw rests on after release
            # (golden traces: the tcp parks at bar-radius standoff above
            # the arm) and lets presses land anywhere along it
            handle_radius=0.017,
            face_dir=tuple(
                (np.array([arm_x, -0.175, 0.0])
                 / np.linalg.norm([arm_x, -0.175, 0.0])).tolist()
            ),
            face_radius=0.055,
            press_off=tuple(
                (-0.055 * np.array([arm_x, -0.175, 0.0])
                 / np.linalg.norm([arm_x, -0.175, 0.0])).tolist()
            ),
            # the reference claw closes AROUND the handle knob and orbits the
            # column dragging it (sawyer_faucet_open_v3.py policy path) — a
            # hook, not a press: the scripted grab point is ~35 mm from the
            # knob site, outside any honest press-face reach
            hookable=True,
        )],
        # ref hand_low z = -0.15 (sawyer_faucet_open_v3.py hand_low)
        mocap_low=(-0.5, 0.40, -0.15),
        mocap_high=(0.5, 1.0, 0.5),
    )
    return TaskSpec(
        name=name,
        task_id=task_id,
        scene=scene,
        rand_low=np.asarray(obj_low),
        rand_high=np.asarray(obj_high),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.asarray((-0.5, 0.40, 0.05)),
        goal_high=np.asarray((0.5, 1.0, 0.5)),
        reset_fn=_reset,
        reward_fn=make_faucet_reward(obj_offset),
        obs_fn=faucet_obs,
        quat_style=("wxyz", "wxyz"),
        n_obs_obj=1,
    )


@registry.register("faucet-open-v3")
def make_spec(task_id: int) -> TaskSpec:
    return make_faucet_spec(
        "faucet-open-v3", task_id,
        (-0.05, 0.8, 0.0), (0.05, 0.85, 0.0),
        ccw=True, obj_offset=(-0.04, 0.0, 0.03), arm_x=-0.015,
    )
