"""Minimal host-side visualizer (rgb_array render mode).

The reference renders through MuJoCo's native OpenGL stack (GLFW/OSMesa/EGL,
cameras in xyz_base.xml:16-20). Throughput training never renders, so this
is a lightweight parity surface: a top-down orthographic rasterization of
the device state (table, hole, static boxes, objects, pads, target) into an
RGB array using pure numpy.
"""

from __future__ import annotations

import numpy as np

W, H = 480, 480
# world window: x in [-0.6, 0.6], y in [0.2, 1.1]
X0, X1 = -0.6, 0.6
Y0, Y1 = 0.2, 1.1


def _to_px(x, y):
    px = (x - X0) / (X1 - X0) * (W - 1)
    py = (1.0 - (y - Y0) / (Y1 - Y0)) * (H - 1)
    return int(px), int(py)


def _disk(img, cx, cy, r_px, color):
    x0, x1 = max(cx - r_px, 0), min(cx + r_px + 1, W)
    y0, y1 = max(cy - r_px, 0), min(cy + r_px + 1, H)
    if x0 >= x1 or y0 >= y1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r_px ** 2
    img[y0:y1, x0:x1][mask] = color


def _rect(img, cx, cy, hx_px, hy_px, color):
    x0, x1 = max(cx - hx_px, 0), min(cx + hx_px + 1, W)
    y0, y1 = max(cy - hy_px, 0), min(cy + hy_px + 1, H)
    if x0 < x1 and y0 < y1:
        img[y0:y1, x0:x1] = color


def _r_px(r):
    return max(int(r / (X1 - X0) * W), 2)


def render_state(spec, state) -> np.ndarray:
    """Rasterize one EnvState to (H, W, 3) uint8 (top-down view)."""
    img = np.full((H, W, 3), 235, dtype=np.uint8)
    # table
    tx0, ty0 = _to_px(-0.55, 1.0)
    tx1, ty1 = _to_px(0.55, 0.25)
    img[ty0:ty1, tx0:tx1] = (205, 185, 150)

    scene = spec.scene
    fixture = np.asarray(state.sim.fixture_pos)

    # hole
    hs = np.asarray(scene.hole_halfsize)
    if (hs > 0).any():
        hc = np.asarray(scene.hole_center)
        cx, cy = _to_px(hc[0], hc[1])
        _rect(img, cx, cy, _r_px(hs[0]), _r_px(hs[1]), (90, 70, 50))

    # static boxes
    for i in range(scene.static_exists.shape[0]):
        if scene.static_exists[i] <= 0:
            continue
        pos = np.asarray(scene.static_pos[i]) + (
            fixture if scene.static_rel[i] > 0 else 0.0
        )
        cx, cy = _to_px(pos[0], pos[1])
        _rect(img, cx, cy, _r_px(scene.static_size[i][0]),
              _r_px(scene.static_size[i][1]), (120, 120, 130))

    # target
    t = np.asarray(state.target)
    cx, cy = _to_px(t[0], t[1])
    _disk(img, cx, cy, 5, (220, 40, 40))

    # objects
    obj = np.asarray(state.sim.obj_pos)
    for i in range(obj.shape[0]):
        if scene.obj_exists[i] <= 0:
            continue
        cx, cy = _to_px(obj[i, 0], obj[i, 1])
        shade = int(np.clip(80 + obj[i, 2] * 400, 0, 255))
        _disk(img, cx, cy, _r_px(float(scene.obj_radius[i])),
              (40, shade, 220))

    # fixture handles
    from metaworld_tpu.physics import engine

    handles = np.asarray(engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q
    ))
    for i in range(handles.shape[0]):
        if scene.joint_exists[i] <= 0:
            continue
        cx, cy = _to_px(handles[i, 0], handles[i, 1])
        _disk(img, cx, cy, 4, (250, 160, 30))

    # gripper pads
    hand = np.asarray(state.sim.hand)
    gap = float(state.sim.gripper) * 0.1 - 0.006
    for s in (-1.0, 1.0):
        cx, cy = _to_px(hand[0], hand[1] + s * gap / 2)
        _disk(img, cx, cy, 3, (30, 30, 30))
    cx, cy = _to_px(hand[0], hand[1])
    _disk(img, cx, cy, 2, (0, 200, 0))

    return img


# ---------------------------------------------------------------------------
# perspective cameras + depth (ref xyz_base.xml:16-20 cameras, docs/rendering)
# ---------------------------------------------------------------------------

CAMERAS = {
    # name: (position, look-at) in world coordinates
    "corner": (np.array([1.1, 0.0, 0.8]), np.array([0.0, 0.65, 0.1])),
    "corner2": (np.array([-1.1, 0.0, 0.8]), np.array([0.0, 0.65, 0.1])),
    "behindGripper": (None, None),  # computed from the live hand pose
}
_FOCAL = 500.0


def _view(cam_pos, look_at):
    fwd = look_at - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.array([0.0, 0.0, 1.0]))
    right = right / max(np.linalg.norm(right), 1e-9)
    up = np.cross(right, fwd)
    return np.stack([right, up, fwd]), cam_pos


def _project(R, C, pts):
    """World points -> (u, v, depth). Camera z is the view-ray distance."""
    q = (pts - C) @ R.T
    z = np.maximum(q[:, 2], 1e-3)
    u = W / 2 + _FOCAL * q[:, 0] / z
    v = H / 2 - _FOCAL * q[:, 1] / z
    return u, v, z


def _primitives(spec, state):
    """(pos(3), world radius, rgb) spheres describing the scene."""
    scene = spec.scene
    fixture = np.asarray(state.sim.fixture_pos)
    prims = []
    # static boxes as coarse sphere clouds
    for i in range(scene.static_exists.shape[0]):
        if scene.static_exists[i] <= 0:
            continue
        pos = np.asarray(scene.static_pos[i]) + (
            fixture if scene.static_rel[i] > 0 else 0.0)
        size = np.asarray(scene.static_size[i])
        n = np.maximum((size / 0.03).astype(int), 1)
        for ix in range(n[0]):
            for iy in range(n[1]):
                p = pos + (np.array([ix + 0.5, iy + 0.5, 0.5]) / n - 0.5) \
                    * 2 * size * np.array([1, 1, 0])
                prims.append((p, float(min(size[2], 0.03)), (120, 120, 130)))
    t = np.asarray(state.target)
    prims.append((t, 0.012, (220, 40, 40)))
    obj = np.asarray(state.sim.obj_pos)
    for i in range(obj.shape[0]):
        if scene.obj_exists[i] > 0:
            prims.append((obj[i], float(scene.obj_radius[i]), (40, 90, 220)))
    from metaworld_tpu.physics import engine

    handles = np.asarray(engine.fixture_handle_pos(
        spec.scene_device, state.sim.fixture_pos, state.sim.joint_q))
    for i in range(handles.shape[0]):
        if scene.joint_exists[i] > 0:
            prims.append((handles[i], 0.02, (250, 160, 30)))
    hand = np.asarray(state.sim.hand)
    gap = float(state.sim.gripper) * 0.1 - 0.006
    for s in (-1.0, 1.0):
        prims.append((hand + np.array([0.0, s * gap / 2, 0.045]), 0.012,
                      (30, 30, 30)))
    prims.append((hand, 0.01, (0, 200, 0)))
    return prims


def render_camera(spec, state, camera: str = "corner",
                  depth: bool = False) -> np.ndarray:
    """Perspective render from a named camera; returns (H, W, 3) uint8 rgb,
    or (H, W) float32 view-ray depth in meters when depth=True."""
    if camera == "topview":
        assert not depth, "topview is the orthographic rasterizer (rgb only)"
        return render_state(spec, state)
    if camera == "behindGripper":
        hand = np.asarray(state.sim.hand)
        cam_pos = hand + np.array([0.0, -0.35, 0.25])
        look = hand
    else:
        cam_pos, look = CAMERAS[camera]
    R, C = _view(cam_pos, look)

    img = np.full((H, W, 3), 235, dtype=np.uint8)
    zbuf = np.full((H, W), np.inf, dtype=np.float32)

    # table: coarse grid of patches
    gx, gy = np.meshgrid(np.linspace(-0.55, 0.55, 40),
                         np.linspace(0.25, 1.0, 28))
    table_pts = np.stack([gx.ravel(), gy.ravel(),
                          np.zeros(gx.size)], axis=1)
    prims = [(p, 0.022, (205, 185, 150)) for p in table_pts]
    prims += _primitives(spec, state)

    pts = np.asarray([p for p, _, _ in prims])
    u, v, z = _project(R, C, pts)
    order = np.argsort(-z)  # painter: far to near
    for idx in order:
        p, r, color = prims[idx]
        r_px = max(int(_FOCAL * r / z[idx]), 1)
        cx, cy = int(u[idx]), int(v[idx])
        x0, x1 = max(cx - r_px, 0), min(cx + r_px + 1, W)
        y0, y1 = max(cy - r_px, 0), min(cy + r_px + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r_px ** 2
        img[y0:y1, x0:x1][mask] = color
        zb = zbuf[y0:y1, x0:x1]
        zb[mask] = np.minimum(zb[mask], z[idx])
        zbuf[y0:y1, x0:x1] = zb

    if depth:
        zbuf[np.isinf(zbuf)] = 0.0
        return zbuf
    return img
