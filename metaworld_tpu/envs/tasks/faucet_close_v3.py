"""faucet-close-v3: rotate the faucet handle clockwise (-x side).

Ref metaworld/envs/sawyer_faucet_close_v3.py: same faucet, target =
base + (-0.175, 0, 0.125); reward has no obj offset.
"""

from __future__ import annotations

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import TaskSpec
from metaworld_tpu.envs.tasks.faucet_open_v3 import make_faucet_spec


@registry.register("faucet-close-v3")
def make_spec(task_id: int) -> TaskSpec:
    return make_faucet_spec(
        "faucet-close-v3", task_id,
        (-0.1, 0.8, 0.0), (0.1, 0.85, 0.0),
        ccw=False, obj_offset=(0.0, 0.0, 0.0), arm_x=0.015,
    )
