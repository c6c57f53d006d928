"""coffee-push-v3: push the mug under the coffee machine.

Ref metaworld/envs/sawyer_coffee_push_v3.py: mirror of coffee-pull — mug at
rand in [-0.1,0.1]x[0.55,0.65], goal in [-0.05,0.05]x[0.7,0.75]; machine at
goal + (0,0.22,0); same reward; success <= 0.07.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.tasks import common
from metaworld_tpu.envs.tasks.coffee_pull_v3 import coffee_mug_scene, make_coffee_reward


def _reset(spec: TaskSpec, rand, rng):
    def good(v):
        return jnp.linalg.norm(v[:2] - v[3:5]) >= 0.15

    rand = common.sample_until(good, rand, rng, spec.rand_low, spec.rand_high)
    mug = jnp.array([rand[0], rand[1], 0.0])
    target = rand[3:6]
    machine = target + jnp.array([0.0, 0.22, 0.0])
    return dict(
        obj_pos=common.pad_obj_pos(mug + jnp.array([0.0, 0.0, 0.035])),
        obj_init_pos=common.pad_obj_pos(mug),
        target=target,
        fixture_pos=machine,
    )


@registry.register("coffee-push-v3")
def make_spec(task_id: int) -> TaskSpec:
    return TaskSpec(
        name="coffee-push-v3",
        task_id=task_id,
        scene=coffee_mug_scene(),
        rand_low=np.array([-0.1, 0.55, -0.001, -0.05, 0.7, -0.001]),
        rand_high=np.array([0.1, 0.65, 0.001, 0.05, 0.75, 0.001]),
        hand_init_pos=np.array([0.0, 0.4, 0.2]),
        goal_low=np.array([-0.05, 0.7, -0.001]),
        goal_high=np.array([0.05, 0.75, 0.001]),
        obj_report_off=np.array([[0.0, 0.0, -0.035], [0.0, 0.0, 0.0]],
                                np.float32),
        reset_fn=_reset,
        reward_fn=make_coffee_reward(),
        n_obs_obj=1,
    )
