"""Open-loop trajectory-parity regression guard.

Replays each golden trace's recorded ACTION SEQUENCE through OUR engine
(the measurement harness lives in scripts/trajectory_parity.py; current
per-task values are recorded in docs/parity.md) and pins per-task
ceilings at ~1.6x the measured deviation, so engine changes that degrade
state-level fidelity vs the reference fail loudly. Where the open-loop
replay currently reaches success as the reference did (40/50 tasks), that
agreement is asserted too.

Open-loop divergence is expected and compounds: two different engines
integrate the same actions, and once a contact lands on a different
2.5 ms substep the trajectories legitimately fork (the reference's own
determinism guarantee, tests/.../test_seeded_rand_vec.py, only covers
same-engine replays). The ceilings quantify — rather than hide — the gap
called out by BASELINE.md's state-parity target.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

from metaworld_tpu.envs import registry  # noqa: E402

# (hand_p95_m, obj_p95_m, rew_mae_rel, open_loop_success_agrees)
CEILINGS = {
    "assembly-v3": (0.030, 0.030, 0.083, 1),
    "basketball-v3": (0.312, 0.329, 0.624, 1),
    "bin-picking-v3": (0.040, 0.037, 0.083, 1),
    "box-close-v3": (0.170, 0.204, 0.194, 0),
    "button-press-topdown-v3": (0.177, 0.030, 0.933, 1),
    "button-press-topdown-wall-v3": (0.330, 0.135, 0.942, 1),
    "button-press-v3": (0.030, 0.030, 0.462, 1),
    "button-press-wall-v3": (0.138, 0.080, 0.317, 0),
    "coffee-button-v3": (0.086, 0.030, 0.083, 1),
    "coffee-pull-v3": (0.032, 0.030, 0.083, 1),
    "coffee-push-v3": (0.030, 0.103, 1.025, 1),
    "dial-turn-v3": (0.106, 0.134, 0.980, 1),
    "disassemble-v3": (0.041, 0.047, 0.083, 1),
    "door-close-v3": (0.217, 0.174, 0.083, 1),
    "door-lock-v3": (0.580, 0.207, 0.726, 1),
    "door-open-v3": (0.366, 0.972, 1.282, 0),
    "door-unlock-v3": (0.248, 0.301, 0.341, 1),
    "drawer-close-v3": (0.049, 0.030, 0.083, 1),
    "drawer-open-v3": (0.158, 0.324, 1.131, 0),
    "faucet-close-v3": (0.385, 0.477, 0.729, 1),
    "faucet-open-v3": (0.369, 0.514, 0.188, 1),
    "hammer-v3": (0.083, 0.100, 0.280, 1),
    "hand-insert-v3": (0.174, 0.377, 1.376, 0),
    "handle-press-side-v3": (0.030, 0.062, 0.083, 1),
    "handle-press-v3": (0.038, 0.031, 0.088, 1),
    "handle-pull-side-v3": (0.030, 0.033, 0.138, 1),
    "handle-pull-v3": (0.030, 0.030, 0.083, 1),
    "lever-pull-v3": (0.672, 0.621, 0.083, 1),
    "peg-insert-side-v3": (0.036, 0.042, 0.083, 1),
    "peg-unplug-side-v3": (0.049, 0.112, 0.367, 1),
    "pick-out-of-hole-v3": (0.038, 0.038, 0.083, 1),
    "pick-place-v3": (0.046, 0.044, 0.083, 1),
    "pick-place-wall-v3": (0.059, 0.056, 0.083, 1),
    "plate-slide-back-side-v3": (0.045, 0.493, 0.261, 0),
    "plate-slide-back-v3": (0.045, 0.296, 0.161, 1),
    "plate-slide-side-v3": (0.332, 0.378, 0.798, 1),
    "plate-slide-v3": (0.335, 0.123, 1.071, 1),
    "push-back-v3": (0.067, 0.625, 0.246, 0),
    "push-v3": (0.077, 0.071, 0.083, 1),
    "push-wall-v3": (0.090, 0.083, 0.083, 1),
    "reach-v3": (0.030, 0.030, 0.083, 1),
    "reach-wall-v3": (0.045, 0.030, 0.083, 1),
    "shelf-place-v3": (0.333, 0.295, 0.528, 1),
    "soccer-v3": (0.321, 0.361, 0.654, 0),
    "stick-pull-v3": (0.100, 0.068, 0.083, 1),
    "stick-push-v3": (0.277, 0.331, 1.080, 1),
    "sweep-into-v3": (0.185, 0.182, 0.222, 1),
    "sweep-v3": (0.032, 0.092, 1.175, 1),
    "window-close-v3": (0.332, 0.030, 0.101, 1),
    "window-open-v3": (0.053, 0.030, 0.140, 1),
}


def test_ceiling_table_covers_all_tasks():
    assert set(CEILINGS) == set(registry.ALL_V3_ENVIRONMENTS)


@pytest.mark.parametrize("name", sorted(CEILINGS))
def test_open_loop_trajectory_parity(name):
    from trajectory_parity import score

    s = score(name)
    hand_max, obj_max, mae_max, succ_agrees = CEILINGS[name]
    assert s["hand_p95"] <= hand_max, (
        f"{name}: hand p95 {s['hand_p95']*1000:.1f}mm > "
        f"ceiling {hand_max*1000:.0f}mm")
    assert s["obj_p95"] <= obj_max, (
        f"{name}: obj p95 {s['obj_p95']*1000:.1f}mm > "
        f"ceiling {obj_max*1000:.0f}mm")
    assert s["rew_mae_rel"] <= mae_max, (
        f"{name}: reward MAE {s['rew_mae_rel']:.3f} > ceiling {mae_max:.3f}")
    if succ_agrees:
        assert s["succ_ours"] >= s["succ_ref"], (
            f"{name}: open-loop replay lost success agreement")
