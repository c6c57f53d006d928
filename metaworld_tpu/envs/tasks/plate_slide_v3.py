"""plate-slide-v3: slide the puck forward into the goal cabinet.

Ref metaworld/envs/sawyer_plate_slide_v3.py: puck (2-dof planar, not
graspable) starts at (0,0.6,0.015); goal in [-0.1,0.1]x[0.85,0.9] z=0;
v2 reward (:121-165): 8 * hamacher(object_grasped(reach), in_place);
success |obj - target| <= 0.07.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.scene_builder import FreeObj, StaticBox, build_scene
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.rewards import utils as reward_utils


def _cabinet_boxes(sideways: bool):
    """Goal-net collision (ref objects/assets/puck_goal.xml): back wall
    (net + rail at local y ~0.077), two side walls (rails at x +-0.105),
    and the thin front top lip bar (local (0, -0.0685, 0.174), r 0.008) —
    the top is otherwise open netting. `sideways` bakes the scene euler
    z=1.57 (local (x, y) -> world (-y, x)); centers are rel_fixture."""
    # compiled puck_goal collision (live plate-slide model): full-height
    # wall meshes (g40 back z to 0.20, g41/g43 sides z to 0.195) and the
    # thin top sheet g42 at z 0.177 — the round-1 half-height walls let
    # the open-loop hand CLIMB OVER the back of the cabinet once the
    # mocap marched on
    local = [
        # wall faces calibrated on the golden puck stops (side variant:
        # center -0.329 on a face at local +0.076; the mesh frame origins
        # understate the curved shells' surfaces)
        ((0.0, 0.082, 0.0964), (0.11, 0.006, 0.1035)),     # back wall
        ((0.105, 0.0, 0.0882), (0.006, 0.091, 0.1068)),    # side
        ((-0.105, 0.0, 0.0882), (0.006, 0.091, 0.1068)),   # side
        ((0.0, -0.014, 0.177), (0.105, 0.057, 0.004)),     # top sheet
        # front top lip: a r=0.008 capsule in the reference (puck_goal
        # g48) that the hand mesh SQUEEZES PAST — golden plate-slide
        # parks the tcp at y 0.844, 60 mm INSIDE the lip plane, so it
        # must not block the hand (our fat knuckle-sphere proxy walled
        # the hand 85 mm out); it still fences the puck
        ((0.0, -0.0685, 0.174), (0.105, 0.01, 0.012), False),
    ]
    out = []
    for (cx, cy, cz), (hx, hy, hz), *bh in local:
        if sideways:
            cx, cy, hx, hy = -cy, cx, hy, hx
        out.append(StaticBox(pos=(cx, cy, cz), size=(hx, hy, hz),
                             rel_fixture=True,
                             blocks_hand=(bh[0] if bh else True)))
    return out


def make_puck_scene(sideways: bool = False):
    return build_scene(
        # the puck is a BOX on two LIMITED slide joints, channel at
        # (0, 0.6): world x in [-0.2, 0.2], y in [0.6, 0.9] (ref
        # objects/assets/puck.xml:5-6; both scenes' puck_channel bodies
        # are unrotated). The stops are what cap every sweep.
        objs=[FreeObj(radius=0.05, half_h=0.015, graspable=False, mass=0.3,
                      xy_range=(-0.2, 0.6, 0.2, 0.9))],
        boxes=_cabinet_boxes(sideways),
        mocap_low=(-0.5, 0.40, 0.05),
        mocap_high=(0.5, 1.0, 0.5),
    )


def make_puck_reset(puck_start, cabinet=None):
    """`cabinet`: None -> the cabinet body follows the goal (plate-slide's
    reset writes model.body("puck_goal").pos, ref
    sawyer_plate_slide_v3.py:118). The side/back variants instead write
    data.body(...).xpos (ref sawyer_plate_slide_side_v3.py:114) — a no-op
    that mj_forward overwrites — so THEIR cabinet stays at the scene XML
    position; pass that constant (confirmed by the golden traces: the
    sideways puck stops on the rail plane of the XML spot, not the goal)."""
    cab = None if cabinet is None else jnp.asarray(cabinet)

    def _reset(spec: TaskSpec, rand, rng):
        return dict(
            obj_pos=common.pad_obj_pos(jnp.asarray(puck_start)),
            obj_init_pos=common.pad_obj_pos(rand[:3]),
            target=rand[3:6],
            fixture_pos=rand[3:6] if cab is None else cab,
        )
    return _reset


def _reward(spec: TaskSpec, state, obs, action):
    target_radius = 0.05
    tcp = state.sim.hand
    obj = obs[4:7]
    target = state.target
    obj_to_target = jnp.linalg.norm(obj - target)
    in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, target_radius), margin=in_place_margin,
        sigmoid="long_tail",
    )
    tcp_to_obj = jnp.linalg.norm(tcp - obj)
    grasp_margin = jnp.linalg.norm(state.init_tcp - state.obj_init_pos[0])
    object_grasped = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, target_radius), margin=grasp_margin,
        sigmoid="long_tail",
    )
    reward = 8.0 * reward_utils.hamacher_product(object_grasped, in_place)
    reward = jnp.where(obj_to_target < target_radius, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.07).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
        grasp_success=1.0,
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=obj_to_target,
    )


def staged_puck_reward(spec: TaskSpec, state, obs, action):
    """Shared by the side/back variants (e.g. ref
    sawyer_plate_slide_side_v3.py:126-170): margins subtract the radius and
    the in_place stage gates on tcp height."""
    target_radius = 0.05
    tcp = state.sim.hand
    obj = obs[4:7]
    target = state.target
    obj_to_target = jnp.linalg.norm(obj - target)
    in_place_margin = jnp.linalg.norm(state.obj_init_pos[0] - target)
    in_place = reward_utils.tolerance(
        obj_to_target, bounds=(0, target_radius),
        margin=in_place_margin - target_radius, sigmoid="long_tail",
    )
    tcp_to_obj = jnp.linalg.norm(tcp - obj)
    grasp_margin = jnp.linalg.norm(state.init_tcp - state.obj_init_pos[0])
    object_grasped = reward_utils.tolerance(
        tcp_to_obj, bounds=(0, target_radius),
        margin=grasp_margin - target_radius, sigmoid="long_tail",
    )
    reward = 1.5 * object_grasped
    reward = jnp.where(
        (tcp[2] <= 0.03) & (tcp_to_obj < 0.07), 2.0 + 7.0 * in_place, reward
    )
    reward = jnp.where(obj_to_target < target_radius, 10.0, reward)
    return common.eval_out(
        reward=reward,
        success=(obj_to_target <= 0.07).astype(jnp.float32),
        near_object=(tcp_to_obj <= 0.03).astype(jnp.float32),
        grasp_success=1.0,
        grasp_reward=object_grasped,
        in_place_reward=in_place,
        obj_to_target=obj_to_target,
    )


@registry.register("plate-slide-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="plate-slide-v3",
        task_id=task_id,
        scene=make_puck_scene(),
        rand_low=np.array([0.0, 0.6, 0.0, -0.1, 0.85, 0.0]),
        rand_high=np.array([0.0, 0.6, 0.0, 0.1, 0.9, 0.0]),
        hand_init_pos=np.array([0.0, 0.6, 0.2]),
        goal_low=np.array([-0.1, 0.85, 0.0]),
        goal_high=np.array([0.1, 0.9, 0.0]),
        reset_fn=make_puck_reset((0.0, 0.6, 0.015)),
        reward_fn=_reward,
        n_obs_obj=1,
    )
