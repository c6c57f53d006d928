"""Generate golden trace fixtures from the reference Meta-World (CPU MuJoCo).

Run once, offline. For every one of the 50 tasks this records a full
scripted-policy rollout from the reference implementation — per-step
observations, actions, rewards, info metrics, and internal quantities the
reference's reward functions consume (tcp_center, pad positions) — plus the
reset-time constants (rand_vec, target, init positions, per-task margins).

The fixtures (tests/golden/<env>.npz) are the parity oracle for:
  * observation layout (ref sawyer_xyz_env.py:475-527)
  * reward functions   (ref per-task compute_reward, e.g. sawyer_reach_v3.py:140)
  * scripted policies  (ref policies/*.py)
  * physics calibration (hand/mocap tracking, gripper dynamics, grasping)

The generated .npz files are committed; tests never import the reference.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/reference")

import numpy as np

# The reference asset tree is missing textures/wood1.png (referenced by the
# hammer/peg/box/shelf/club dependency XMLs). Redirect asset resolution to a
# shadow tree (/tmp/mw_assets: symlinks + a stand-in wood1.png) before any env
# module binds full_V3_path_for.
import metaworld.asset_path_utils as _apu
import os

if os.path.isdir("/tmp/mw_assets"):
    from pathlib import Path

    _apu.ENV_ASSET_DIR_V3 = Path("/tmp/mw_assets")

SEED = 42
MAX_STEPS = 500

# Env attributes captured after reset when present (per-task reward margins).
ATTR_NAMES = [
    "objHeight",
    "heightTarget",
    "maxReachDist",
    "maxPushDist",
    "maxPlacingDist",
    "obj_init_angle",
    "obj_init_pos",
    "hand_init_pos",
    "init_tcp",
    "init_left_pad",
    "init_right_pad",
    "_target_pos",
    "_last_rand_vec",
    "target_reward",
    "_target_to_obj_init",
    "prev_obs",
    "succeed",
    "_handle_init_pos",
    "door_angle",
    "_lock_length",
    "obj_init_qpos",
    "init_stick",
    "stick_init_pos",
    "basket_pos",
    "_nail_init_pos",
]


def snapshot_attrs(env):
    out = {}
    for name in ATTR_NAMES:
        v = getattr(env, name, None)
        if v is None:
            continue
        try:
            arr = np.asarray(v, dtype=np.float64)
        except Exception:
            continue
        if arr.size <= 16:
            out[f"attr_{name.lstrip('_')}"] = arr
    return out


def run_env(name, task_idx=0, seed=SEED):
    import metaworld
    from metaworld.policies import ENV_POLICY_MAP

    mt1 = metaworld.MT1(name, seed=seed)
    env = mt1.train_classes[name]()
    env.set_task(mt1.train_tasks[task_idx])
    obs, _ = env.reset()
    policy = ENV_POLICY_MAP[name]()

    rec = {k: [] for k in (
        "obs", "action", "reward", "success", "near_object", "grasp_success",
        "grasp_reward", "in_place_reward", "obj_to_target", "unscaled_reward",
        "tcp", "leftpad", "rightpad", "mocap", "qpos", "qvel",
    )}
    static = snapshot_attrs(env)
    static["obs0"] = obs.copy()

    for _ in range(MAX_STEPS):
        # pass a COPY: three reference policies (door-open/door-close/
        # button-press) mutate the obs array in place via numpy views
        # (e.g. `pos_door += ...`, ref sawyer_door_close_v3_policy.py:40),
        # which would corrupt the recorded observation trace
        a = policy.get_action(obs.copy()).astype(np.float64)
        rec["obs"].append(obs.copy())
        rec["action"].append(a.copy())
        rec["tcp"].append(np.asarray(env.tcp_center, dtype=np.float64).copy())
        rec["leftpad"].append(env.get_body_com("leftpad").copy())
        rec["rightpad"].append(env.get_body_com("rightpad").copy())
        rec["mocap"].append(env.data.mocap_pos[0].copy())
        rec["qpos"].append(env.data.qpos.copy())
        rec["qvel"].append(env.data.qvel.copy())
        obs, r, term, trunc, info = env.step(a)
        rec["reward"].append(float(r))
        for k in ("success", "near_object", "grasp_success", "grasp_reward",
                  "in_place_reward", "obj_to_target", "unscaled_reward"):
            rec[k].append(float(info[k]))
        if trunc:
            break
    static["final_obs"] = obs.copy()
    out = {k: np.asarray(v) for k, v in rec.items() if len(v)}
    out.update(static)
    return out


def main():
    from metaworld.env_dict import ALL_V3_ENVIRONMENTS

    names = sys.argv[1:] or list(ALL_V3_ENVIRONMENTS.keys())
    for name in names:
        try:
            data = run_env(name)
            n = len(data["reward"])
            succ = float(np.max(data["success"])) if n else 0.0
            np.savez_compressed(f"/root/repo/tests/golden/{name}.npz", **data)
            print(f"{name}: {n} steps, success={succ}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
