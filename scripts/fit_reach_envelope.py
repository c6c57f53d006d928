"""Sample the Sawyer arm's kinematic reach envelope from the reference model.

Run once, offline (like gen_golden.py). The reference drives the hand with
a mocap weld, but the ARM between the weld and the world has joint limits:
a weld target outside the arm's reachable set leaves the tcp parked on the
envelope boundary nearest the target (e.g. push-back's scripted approach
commands mocap y=0.893 at z=0.05 and the tcp stalls at y~0.845 with
right_j1 pinned at its -0.50 range stop — verified by replaying the golden
action tape through raw MuJoCo and reading d.qpos at the stall). A pure
mocap-box clamp cannot express this, so the engine consumes the sampled
SETTLED-TCP FIELD produced here: for every mocap grid point, where does
the welded tcp actually settle?

Method: load one reference scene (the arm is identical across all 50),
initialize the mocap weld exactly as SawyerMocapBase.reset_mocap_welds does
(ref sawyer_xyz_env.py:133-140), disable every collision that is not
arm-self-contact (table/walls/objects are scene-specific and the engine
models them separately), and for each grid target settle 400 substeps from
a canonical mid-workspace pose (settling is path-independent: targets
re-settled from different start poses land within float noise).

Output: metaworld_tpu/data/reach_envelope.npz
  lo, hi   — grid bounds (3,)
  n        — grid shape (3,)
  delta    — (nx, ny, nz, 3) f16: settled_tcp - (mocap + TCP_OFFSET)
The engine trilerps `delta` at the live mocap position and adds it to its
weld target, so interior tracking is unchanged (delta ~ 0 there) while
boundary targets are pulled onto the envelope.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/reference")

import mujoco
import numpy as np

TCP_OFFSET = np.array([0.0044, 0.0015, -0.0498])  # engine.py constant
XML = "/root/reference/metaworld/assets/sawyer_xyz/sawyer_push_back_v3.xml"

# grid: covers every task's mocap box (hand_low/high unions)
LO = np.array([-0.55, 0.35, -0.075])
HI = np.array([0.55, 1.05, 0.55])
STEP = 0.025


def build_model():
    m = mujoco.MjModel.from_xml_path(XML)
    # mocap weld init (ref sawyer_xyz_env.py:133-140)
    for i in range(m.eq_data.shape[0]):
        if m.eq_type[i] == mujoco.mjtEq.mjEQ_WELD:
            m.eq_data[i] = np.array(
                [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 5.0]
            )
    # keep only arm-subtree collisions (bodies rooted at "base")
    base = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "base")

    def in_arm(b):
        while b != 0:
            if b == base:
                return True
            b = m.body_parentid[b]
        return False

    for gid in range(m.ngeom):
        if not in_arm(m.geom_bodyid[gid]):
            m.geom_contype[gid] = 0
            m.geom_conaffinity[gid] = 0
    return m


def main():
    m = build_model()
    d = mujoco.MjData(m)
    names = [mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_SITE, i) for i in range(m.nsite)]
    ri, li = names.index("rightEndEffector"), names.index("leftEndEffector")

    def tcp():
        return (d.site_xpos[ri] + d.site_xpos[li]) / 2

    # canonical start: settle at the shared hand_init region (0, 0.6, 0.2)
    mujoco.mj_resetData(m, d)
    d.mocap_pos[0] = np.array([0.0, 0.6, 0.2])
    d.mocap_quat[0] = np.array([1.0, 0.0, 1.0, 0.0])
    for _ in range(600):
        mujoco.mj_step(m, d)
    q0 = d.qpos.copy()
    print("canonical tcp:", tcp().round(4))

    axes = [np.arange(LO[k], HI[k] + 1e-9, STEP) for k in range(3)]
    nx, ny, nz = (len(a) for a in axes)
    print("grid", nx, ny, nz, "=", nx * ny * nz, "targets")
    delta = np.zeros((nx, ny, nz, 3), np.float32)
    for ix, x in enumerate(axes[0]):
        for iy, y in enumerate(axes[1]):
            for iz, z in enumerate(axes[2]):
                d.qpos[:] = q0
                d.qvel[:] = 0
                tgt = np.array([x, y, z])
                d.mocap_pos[0] = tgt
                d.mocap_quat[0] = np.array([1.0, 0.0, 1.0, 0.0])
                d.ctrl[:] = 0
                mujoco.mj_forward(m, d)
                for _ in range(400):
                    mujoco.mj_step(m, d)
                delta[ix, iy, iz] = tcp() - (tgt + TCP_OFFSET)
        print(f"  x={x:+.3f} done; |delta| mean {np.linalg.norm(delta[ix], axis=-1).mean()*1000:.1f}mm")
    np.savez_compressed(
        "metaworld_tpu/data/reach_envelope.npz",
        lo=LO.astype(np.float32),
        hi=HI.astype(np.float32),
        n=np.array([nx, ny, nz]),
        delta=delta.astype(np.float16),
    )
    mag = np.linalg.norm(delta, axis=-1)
    print("saved. |delta| p50/p90/max:", np.percentile(mag, 50).round(4),
          np.percentile(mag, 90).round(4), mag.max().round(4))


if __name__ == "__main__":
    main()
