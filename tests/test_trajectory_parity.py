"""Open-loop trajectory-parity regression guard.

Replays each golden trace's recorded ACTION SEQUENCE through OUR engine
(the measurement harness lives in scripts/trajectory_parity.py; current
per-task values are recorded in docs/parity.md) and pins per-task
ceilings at ~1.6x the measured deviation, so engine changes that degrade
state-level fidelity vs the reference fail loudly. Where the open-loop
replay currently reaches success as the reference did (50/50 tasks), that
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
    "assembly-v3": (0.035, 0.030, 0.083, 1),
    "basketball-v3": (0.229, 0.248, 0.184, 1),
    "bin-picking-v3": (0.030, 0.030, 0.083, 1),
    "box-close-v3": (0.080, 0.071, 0.093, 1),
    "button-press-topdown-v3": (0.034, 0.030, 0.083, 1),
    "button-press-topdown-wall-v3": (0.031, 0.030, 0.083, 1),
    "button-press-v3": (0.030, 0.030, 0.141, 1),
    "button-press-wall-v3": (0.030, 0.030, 0.100, 1),
    "coffee-button-v3": (0.037, 0.030, 0.083, 1),
    "coffee-pull-v3": (0.045, 0.042, 0.083, 1),
    "coffee-push-v3": (0.030, 0.050, 0.083, 1),
    "dial-turn-v3": (0.062, 0.036, 0.274, 1),
    "disassemble-v3": (0.030, 0.055, 0.083, 1),
    "door-close-v3": (0.032, 0.161, 0.083, 1),
    "door-lock-v3": (0.488, 0.047, 0.109, 1),
    "door-open-v3": (0.105, 0.044, 0.083, 1),
    "door-unlock-v3": (0.188, 0.262, 0.354, 1),
    "drawer-close-v3": (0.049, 0.030, 0.083, 1),
    "drawer-open-v3": (0.073, 0.068, 0.083, 1),
    "faucet-close-v3": (0.242, 0.529, 0.176, 1),
    "faucet-open-v3": (0.236, 0.290, 0.206, 1),
    "hammer-v3": (0.091, 0.113, 0.587, 1),
    "hand-insert-v3": (0.093, 0.083, 0.083, 1),
    "handle-press-side-v3": (0.032, 0.030, 0.083, 1),
    "handle-press-v3": (0.030, 0.044, 0.155, 1),
    "handle-pull-side-v3": (0.030, 0.037, 0.158, 1),
    "handle-pull-v3": (0.042, 0.033, 0.083, 1),
    "lever-pull-v3": (0.218, 0.199, 0.083, 1),
    "peg-insert-side-v3": (0.032, 0.051, 0.083, 1),
    "peg-unplug-side-v3": (0.034, 0.030, 0.083, 1),
    "pick-out-of-hole-v3": (0.030, 0.030, 0.083, 1),
    "pick-place-v3": (0.042, 0.038, 0.083, 1),
    "pick-place-wall-v3": (0.030, 0.030, 0.083, 1),
    "plate-slide-back-side-v3": (0.034, 0.086, 0.182, 1),
    "plate-slide-back-v3": (0.030, 0.094, 0.099, 1),
    "plate-slide-side-v3": (0.042, 0.036, 0.083, 1),
    "plate-slide-v3": (0.056, 0.030, 0.083, 1),
    "push-back-v3": (0.044, 0.066, 0.178, 1),
    "push-v3": (0.042, 0.038, 0.083, 1),
    "push-wall-v3": (0.040, 0.036, 0.083, 1),
    "reach-v3": (0.036, 0.030, 0.083, 1),
    "reach-wall-v3": (0.033, 0.030, 0.083, 1),
    "shelf-place-v3": (0.084, 0.074, 0.083, 1),
    "soccer-v3": (0.042, 0.037, 0.083, 1),
    "stick-pull-v3": (0.104, 0.068, 0.083, 1),
    "stick-push-v3": (0.039, 0.047, 0.083, 1),
    "sweep-into-v3": (0.039, 0.100, 0.138, 1),
    "sweep-v3": (0.030, 0.049, 0.083, 1),
    "window-close-v3": (0.347, 0.030, 0.099, 1),
    "window-open-v3": (0.058, 0.030, 0.139, 1),
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
