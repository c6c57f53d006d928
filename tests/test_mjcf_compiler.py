"""MJCF compiler cross-checks: parse the reference's actual scene XMLs and
verify the compiled geometry agrees with the curated SceneParams rows the
tasks ship (which also carry engine-calibrated interaction constants the
XML does not express). Skipped when the reference assets are not mounted.
"""

import os
import pathlib

import numpy as np
import pytest

from metaworld_tpu.envs import mjcf, registry

ASSETS = pathlib.Path(
    os.environ.get("METAWORLD_ASSETS", "/root/reference/metaworld/assets"))

pytestmark = pytest.mark.skipif(
    not ASSETS.exists(), reason="reference MJCF assets not mounted")


def test_include_resolution_and_body_tree():
    m = mjcf.parse_mjcf(ASSETS / "sawyer_xyz" / "sawyer_peg_insertion_side.xml")
    names = {b.name for b in m.bodies}
    assert {"peg", "box", "mocap", "hand"} <= names
    assert any(j.kind == "free" and j.body == "peg" for j in m.joints)


def test_peg_block_statics_match_curated_scene():
    """The peg block's euler-z-mounted collision shell compiles to the same
    AABBs the curated peg-insert-side scene declares."""
    m = mjcf.parse_mjcf(ASSETS / "sawyer_xyz" / "sawyer_peg_insertion_side.xml")
    boxes = m.static_boxes("box")
    assert len(boxes) >= 6
    spec = registry.get_spec("peg-insert-side-v3")
    curated = [
        (np.asarray(spec.scene.static_pos[i]),
         np.asarray(spec.scene.static_size[i]))
        for i in range(int(np.asarray(spec.scene.static_exists).sum()))
    ]
    # every curated box matches a compiled collision geom (pos within 1.5cm,
    # half extents within 1.5cm; curated rows may merge adjacent slabs)
    for cpos, csize in curated:
        best = min(np.linalg.norm(cpos - bp) + np.linalg.norm(csize - bh)
                   for bp, bh in boxes)
        assert best < 0.045, f"curated box {cpos} {csize} unmatched ({best:.3f})"


def test_button_box_extents_match():
    m = mjcf.parse_mjcf(ASSETS / "sawyer_xyz" / "sawyer_button_press.xml")
    boxes = m.static_boxes("box")  # the buttonbox body is named 'box'
    if not boxes:  # body naming differs per scene; find the buttonbox
        cands = [b.name for b in m.bodies if "button" in b.name.lower()]
        assert cands, [b.name for b in m.bodies]
        boxes = m.static_boxes(cands[0])
    # the curated horizontal buttonbox is one solid box spanning the slabs:
    # x half 0.12, y span rel [-0.09, 0.114]
    spec = registry.get_spec("button-press-v3")
    csize = np.asarray(spec.scene.static_size[0])
    xs = max(bh[0] for _, bh in boxes)
    ys = [bp[1] + s * bh[1] for bp, bh in boxes for s in (-1, 1)]
    assert abs(xs - csize[0]) < 0.01          # slab width 0.12
    # compiled slab y-extent covers the curated solid box
    spn = (min(ys), max(ys))
    assert spn[0] < -0.08 and spn[1] > 0.10


def test_free_body_and_fixture_joints():
    m = mjcf.parse_mjcf(ASSETS / "sawyer_xyz" / "sawyer_lever_pull.xml")
    hinges = [j for j in m.joints
              if j.kind == "hinge" and "lever" in j.body.lower()]
    assert hinges, "lever hinge not found"
    j = hinges[0]
    # the lever rotates about x at the pivot (0.12, 0, 0.25) rel body
    # (lever.xml:7); body at (0, 0.88, 0)
    assert abs(abs(j.axis[0]) - 1.0) < 1e-6
    np.testing.assert_allclose(j.pos, [0.12, 0.88, 0.25], atol=1e-6)

    m2 = mjcf.parse_mjcf(ASSETS / "sawyer_xyz" / "sawyer_hammer.xml")
    free = [j for j in m2.joints if j.kind == "free"]
    assert any("hammer" in j.body for j in free)
    slides = [j for j in m2.joints if j.kind == "slide"]
    assert any("Nail" in j.body or "nail" in j.body for j in slides)
