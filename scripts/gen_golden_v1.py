"""Generate v1-reward golden traces from the reference (CPU MuJoCo).

Same harness as gen_golden.py but the envs are constructed with
reward_function_version="v1" (ref sawyer_xyz_env.py:187), exercising the
legacy pre-v2 reward branch of every compute_reward. Records per-step
obs/action/reward plus the internal quantities only the v1 formulas consume:
the EndEffector finger sites (fingerCOM, ref e.g. sawyer_reach_v3.py v1
branch), hammer nail/head geometry, the peg head site, and the reset-time
margin constants (maxReachDist/maxPushDist/maxPlacingDist/maxDist/...).

Fixtures land in tests/golden_v1/<env>.npz and are committed; tests never
import the reference.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/reference")

import numpy as np

import metaworld.asset_path_utils as _apu
import os

if os.path.isdir("/tmp/mw_assets"):
    from pathlib import Path

    _apu.ENV_ASSET_DIR_V3 = Path("/tmp/mw_assets")

SEED = 42
MAX_STEPS = 500

ATTR_NAMES = [
    "objHeight", "heightTarget", "liftThresh",
    "maxReachDist", "maxPushDist", "maxPlacingDist", "maxPullDist",
    "maxDist", "maxHammerDist", "maxPlaceDist",
    "hammerHeight", "stickHeight", "obj_height",
    "obj_init_pos", "hand_init_pos", "init_tcp",
    "_target_pos", "_last_rand_vec",
    "hammer_init_pos", "nail_init_pos", "stick_init_pos",
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


def _maybe(fn):
    try:
        return np.asarray(fn(), dtype=np.float64).copy()
    except Exception:
        return None


def run_env(name, task_idx=0, seed=SEED):
    import metaworld
    from metaworld.policies import ENV_POLICY_MAP

    mt1 = metaworld.MT1(name, seed=seed)
    env = mt1.train_classes[name](reward_function_version="v1")
    env.set_task(mt1.train_tasks[task_idx])
    obs, _ = env.reset()
    policy = ENV_POLICY_MAP[name]()

    per_step_extras = {
        "left_ee": lambda: env._get_site_pos("leftEndEffector"),
        "right_ee": lambda: env._get_site_pos("rightEndEffector"),
        "leftpad": lambda: env.get_body_com("leftpad"),
        "rightpad": lambda: env.get_body_com("rightpad"),
        "nail_head": lambda: env.data.site("nailHead").xpos,
        "hammer_head": lambda: env.data.geom("HammerHead").xpos,
        "peg_head": lambda: env._get_site_pos("pegHead"),
        "nut_com": lambda: env.get_body_com("RoundNut"),
    }
    active = {k: f for k, f in per_step_extras.items() if _maybe(f) is not None}

    rec = {k: [] for k in ("obs", "action", "reward", "tcp", *active)}
    static = snapshot_attrs(env)
    static["obs0"] = obs.copy()
    pegpos = _maybe(lambda: env.model.body("peg").pos)
    if pegpos is not None:
        static["peg_body_pos"] = pegpos

    for _ in range(MAX_STEPS):
        # COPY: some reference policies mutate obs in place (see gen_golden.py)
        a = policy.get_action(obs.copy()).astype(np.float64)
        rec["obs"].append(obs.copy())
        rec["action"].append(a.copy())
        rec["tcp"].append(np.asarray(env.tcp_center, dtype=np.float64).copy())
        for k, f in active.items():
            rec[k].append(_maybe(f))
        obs, r, term, trunc, info = env.step(a)
        rec["reward"].append(float(r))
        if trunc:
            break
    out = {k: np.asarray(v) for k, v in rec.items() if len(v)}
    out.update(static)
    return out


def main():
    from metaworld.env_dict import ALL_V3_ENVIRONMENTS

    os.makedirs("/root/repo/tests/golden_v1", exist_ok=True)
    names = sys.argv[1:] or list(ALL_V3_ENVIRONMENTS.keys())
    for name in names:
        try:
            data = run_env(name)
            n = len(data["reward"])
            np.savez_compressed(f"/root/repo/tests/golden_v1/{name}.npz", **data)
            rr = data["reward"]
            print(f"{name}: {n} steps, reward[{rr.min():.2f},{rr.max():.2f}]",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
