"""Dump compiled-model joint truth for every fixture scene.

Compiles the reference MJCF (read-only, /root/reference/metaworld/assets)
with MuJoCo and prints, for every hinge/slide joint: the compiled anchor
(world, and relative to the fixture root body), axis, range, generalized
inertia M[dof,dof] (includes armature), damping, frictionloss, stiffness,
springref, and the world positions of that body's geoms/sites at qpos0 —
the numbers our analytic engine's FixtureJoint rows must carry
(ref model files: metaworld/assets/sawyer_xyz/*.xml).

Usage: python scripts/compiled_truth.py [xml-substring ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import mujoco
import numpy as np

ASSETS = Path("/root/reference/metaworld/assets/sawyer_xyz")


def dump(xml_path: Path) -> None:
    try:
        model = mujoco.MjModel.from_xml_path(str(xml_path))
    except Exception as e:  # some XMLs need the full scene include tree
        print(f"{xml_path.name}: COMPILE FAIL {e}")
        return
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)
    M = np.zeros((model.nv, model.nv))
    mujoco.mj_fullM(model, data, M)

    def body_name(i):
        return mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, i) or f"body{i}"

    print(f"== {xml_path.name}")
    for j in range(model.njnt):
        jtype = model.jnt_type[j]
        if jtype not in (mujoco.mjtJoint.mjJNT_HINGE, mujoco.mjtJoint.mjJNT_SLIDE):
            continue
        name = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_JOINT, j) or f"jnt{j}"
        if name in ("r_close", "l_close") or name.startswith("right_j"):
            continue  # gripper / arm joints
        dof = model.jnt_dofadr[j]
        bid = model.jnt_bodyid[j]
        # fixture root = highest ancestor below world that is not the sawyer
        root = bid
        while model.body_parentid[root] != 0 and body_name(model.body_parentid[root]) not in ("world",):
            root = model.body_parentid[root]
        root_pos = data.xpos[root]
        kind = "hinge" if jtype == mujoco.mjtJoint.mjJNT_HINGE else "slide"
        anchor_rel = data.xanchor[j] - root_pos
        print(
            f"  joint {name!r} ({kind}) body={body_name(bid)} root={body_name(root)} root_pos={np.round(root_pos,4).tolist()}\n"
            f"    anchor_rel={np.round(anchor_rel,4).tolist()} axis={np.round(data.xaxis[j],4).tolist()}"
            f" range={np.round(model.jnt_range[j],4).tolist()} qpos0={float(data.qpos[model.jnt_qposadr[j]]):.4f}\n"
            f"    M={M[dof,dof]:.5f} (armature={model.dof_armature[dof]:.4f})"
            f" damping={model.dof_damping[dof]:.4f} frictionloss={model.dof_frictionloss[dof]:.4f}"
            f" stiffness={model.jnt_stiffness[j]:.4f} springref={model.qpos_spring[model.jnt_qposadr[j]]:.4f}\n"
            f"    subtree_mass={model.body_subtreemass[bid]:.4f}"
            f" subtree_com_rel_anchor={np.round(data.subtree_com[bid] - data.xanchor[j],4).tolist()}"
        )
        # geoms and sites on the jointed body and its children, rel to anchor
        for g in range(model.ngeom):
            gb = model.geom_bodyid[g]
            b = gb
            onbody = False
            while b != 0:
                if b == bid:
                    onbody = True
                    break
                b = model.body_parentid[b]
            if not onbody:
                continue
            gname = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, g) or f"geom{g}"
            gt = mujoco.mjtGeom(model.geom_type[g]).name.replace("mjGEOM_", "").lower()
            rel = data.geom_xpos[g] - data.xanchor[j]
            print(
                f"      geom {gname!r} {gt} size={np.round(model.geom_size[g],4).tolist()}"
                f" rel_anchor={np.round(rel,4).tolist()}"
            )
        for s in range(model.nsite):
            sb = model.site_bodyid[s]
            b = sb
            onbody = False
            while b != 0:
                if b == bid:
                    onbody = True
                    break
                b = model.body_parentid[b]
            if not onbody:
                continue
            sname = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_SITE, s) or f"site{s}"
            rel = data.site_xpos[s] - data.xanchor[j]
            print(f"      site {sname!r} rel_anchor={np.round(rel,4).tolist()}")


if __name__ == "__main__":
    pats = sys.argv[1:]
    for p in sorted(ASSETS.glob("*.xml")):
        if pats and not any(s in p.name for s in pats):
            continue
        dump(p)
