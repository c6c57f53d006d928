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
    "assembly-v3": (0.030, 0.030, 0.094, 1),
    "basketball-v3": (0.312, 0.329, 0.746, 1),
    "bin-picking-v3": (0.040, 0.037, 0.088, 1),
    "box-close-v3": (0.170, 0.204, 0.286, 0),
    "button-press-topdown-v3": (0.039, 0.061, 0.941, 0),
    "button-press-topdown-wall-v3": (0.030, 0.031, 0.120, 1),
    "button-press-v3": (0.123, 0.030, 0.376, 1),
    "button-press-wall-v3": (0.030, 0.030, 0.331, 1),
    "coffee-button-v3": (0.104, 0.033, 0.450, 1),
    "coffee-pull-v3": (0.032, 0.030, 0.083, 1),
    "coffee-push-v3": (0.030, 0.103, 1.173, 1),
    "dial-turn-v3": (0.106, 0.091, 1.002, 1),
    "disassemble-v3": (0.041, 0.047, 0.104, 1),
    "door-close-v3": (0.040, 0.925, 1.075, 0),
    "door-lock-v3": (0.580, 0.122, 0.736, 1),
    "door-open-v3": (0.366, 0.741, 1.150, 0),
    "door-unlock-v3": (0.282, 0.236, 1.128, 1),
    "drawer-close-v3": (0.077, 0.268, 1.405, 1),
    "drawer-open-v3": (0.158, 0.140, 0.882, 1),
    "faucet-close-v3": (0.385, 0.365, 0.904, 0),
    "faucet-open-v3": (0.369, 0.404, 1.008, 0),
    "hammer-v3": (0.083, 0.100, 0.384, 1),
    "hand-insert-v3": (0.174, 0.377, 1.500, 0),
    "handle-press-side-v3": (0.030, 0.066, 0.614, 1),
    "handle-press-v3": (0.038, 0.048, 0.360, 1),
    "handle-pull-side-v3": (0.030, 0.261, 0.773, 1),
    "handle-pull-v3": (0.030, 0.030, 0.104, 1),
    "lever-pull-v3": (0.672, 0.623, 0.155, 1),
    "peg-insert-side-v3": (0.596, 0.582, 0.592, 1),
    "peg-unplug-side-v3": (0.049, 0.112, 0.472, 1),
    "pick-out-of-hole-v3": (0.038, 0.038, 0.088, 1),
    "pick-place-v3": (0.046, 0.044, 0.117, 1),
    "pick-place-wall-v3": (0.059, 0.056, 0.101, 1),
    "plate-slide-back-side-v3": (0.045, 0.493, 0.358, 0),
    "plate-slide-back-v3": (0.045, 0.296, 0.251, 1),
    "plate-slide-side-v3": (0.332, 0.378, 0.931, 1),
    "plate-slide-v3": (0.335, 0.123, 1.222, 1),
    "push-back-v3": (0.067, 0.625, 0.342, 0),
    "push-v3": (0.077, 0.071, 0.102, 1),
    "push-wall-v3": (0.090, 0.083, 0.102, 1),
    "reach-v3": (0.030, 0.030, 0.083, 1),
    "reach-wall-v3": (0.045, 0.030, 0.083, 1),
    "shelf-place-v3": (0.333, 0.295, 0.643, 1),
    "soccer-v3": (0.321, 0.361, 0.778, 0),
    "stick-pull-v3": (0.100, 0.068, 0.150, 1),
    "stick-push-v3": (0.277, 0.331, 1.232, 1),
    "sweep-into-v3": (0.185, 0.182, 0.317, 1),
    "sweep-v3": (0.032, 0.092, 1.333, 1),
    "window-close-v3": (0.348, 0.183, 0.744, 1),
    "window-open-v3": (0.302, 0.086, 0.653, 1),
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
