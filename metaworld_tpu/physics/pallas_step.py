"""Pallas TPU kernel for the physics control step.

The lane-oriented substep (physics/engine_lanes.py) is pure elementwise
dataflow over (B,) lanes — exactly what one Pallas kernel invocation can run
entirely out of VMEM/vector registers. Under plain XLA the substep still
splits into dozens of fusions whose intermediates round-trip HBM (~1.7 GB
accessed per 32k-env step); here the kernel reads the packed scene (C, B)
and state (S, B) blocks once, runs all FRAME_SKIP substeps on-chip, and
writes the state block back: bytes accessed drop to the true state size.

Layout: env index on the LANE axis. State and scene are packed into
row-per-lane f32 matrices ((S, N) / (C, N)) so every kernel value is a flat
(B,) vector with full (8, 128)-vreg occupancy — 3-vectors or per-object
fields as separate rows, never a minor axis of 3 (which would waste 42x the
lanes). Packing is spec-driven (_SC_SPEC/_SIM_SPEC) and shared between the
host-side packers and the in-kernel unpackers, so the two cannot drift.

The kernel body simply calls engine_lanes._substep — one physics
implementation, three consumers (per-env XLA, fused-batch XLA, Pallas).
tests/test_engine_lanes.py checks this path in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metaworld_tpu.physics import engine, engine_lanes
from metaworld_tpu.physics.engine_lanes import _NS
from metaworld_tpu.types import (
    ACTION_SCALE,
    FRAME_SKIP,
    MAX_JOINT,
    MAX_OBJ,
    MAX_STATIC,
    SceneParams,
    SimState,
)

# ---------------------------------------------------------------------------
# lane-layout specs: (name, kind, count, as_bool)
# kind: "s" scalar lane | "v2"/"v3" tuple lanes | "ls" list of scalars |
#       "lv2"/"lv3"/"lv4" list of tuples
# ---------------------------------------------------------------------------

_SC_SPEC = [
    ("o_exists", "ls", MAX_OBJ, False),
    ("o_type", "ls", MAX_OBJ, False),
    ("o_radius", "ls", MAX_OBJ, False),
    ("o_half_x", "ls", MAX_OBJ, False),
    ("o_oo_half_x", "ls", MAX_OBJ, False),
    ("o_grasp_x_tol", "ls", MAX_OBJ, False),
    ("o_half_h", "ls", MAX_OBJ, False),
    ("o_graspable", "ls", MAX_OBJ, False),
    ("o_ghw", "ls", MAX_OBJ, False),
    ("o_anchored", "ls", MAX_OBJ, False),
    ("o_tool_off", "lv3", MAX_OBJ, False),
    ("o_droop", "ls", MAX_OBJ, False),
    ("o_grasp_off", "lv3", MAX_OBJ, False),
    ("o_planar", "ls", MAX_OBJ, True),
    ("o_xy_limited", "ls", MAX_OBJ, False),
    ("o_xy_lo", "lv2", MAX_OBJ, False),
    ("o_xy_hi", "lv2", MAX_OBJ, False),
    ("o_hookg", "ls", MAX_OBJ, False),
    ("link_enable", "s", 1, False),
    ("link_handle_off", "v3", 1, False),
    ("j_exists", "ls", MAX_JOINT, False),
    ("j_axis", "lv3", MAX_JOINT, False),
    ("j_anchor", "lv3", MAX_JOINT, False),
    ("j_arm", "lv3", MAX_JOINT, False),
    ("j_range", "lv2", MAX_JOINT, False),
    ("j_damping", "ls", MAX_JOINT, False),
    ("j_stiffness", "ls", MAX_JOINT, False),
    ("j_springref", "ls", MAX_JOINT, False),
    ("j_inertia", "ls", MAX_JOINT, False),
    ("j_bias", "ls", MAX_JOINT, False),
    ("j_mass", "ls", MAX_JOINT, False),
    ("j_com", "lv3", MAX_JOINT, False),
    ("j_handle_radius", "ls", MAX_JOINT, False),
    ("j_face_radius", "ls", MAX_JOINT, False),
    ("j_press_off", "lv3", MAX_JOINT, False),
    ("j_face_dir", "lv3", MAX_JOINT, False),
    ("j_hook_carry", "ls", MAX_JOINT, False),
    ("j_hookable", "ls", MAX_JOINT, False),
    ("j_panel_off", "ls", MAX_JOINT, False),
    ("j_panel", "ls", MAX_JOINT, False),
    ("s_exists", "ls", MAX_STATIC, False),
    ("s_pos", "lv3", MAX_STATIC, False),
    ("s_size", "lv3", MAX_STATIC, False),
    ("s_rel", "ls", MAX_STATIC, False),
    ("hole_c", "v2", 1, False),
    ("hole_h", "v2", 1, False),
    ("pit_depth", "s", 1, False),
    ("table_z", "s", 1, False),
    # hoisted derived lanes (see engine_lanes.scene_lanes)
    ("is_sphere", "ls", MAX_OBJ, True),
    ("is_hinge", "ls", MAX_JOINT, True),
    ("blk", "ls", MAX_STATIC, False),
    ("has_bar", "ls", MAX_JOINT, True),
    ("lever", "ls", MAX_JOINT, False),
    ("visc", "ls", MAX_OBJ, False),
    ("blend", "ls", MAX_OBJ, False),
    ("fric", "ls", MAX_OBJ, False),
    ("sphere_dn", "ls", MAX_OBJ, False),
    ("j_decay", "ls", MAX_JOINT, False),
    ("j_off_cap", "ls", MAX_JOINT, False),
]

_SIM_SPEC = [
    ("hand", "v3", 1, False),
    ("hand_vel", "v3", 1, False),
    ("gripper", "s", 1, False),
    ("gripper_vel", "s", 1, False),
    ("obj_pos", "lv3", MAX_OBJ, False),
    ("obj_quat", "lv4", MAX_OBJ, False),
    ("obj_vel", "lv3", MAX_OBJ, False),
    ("obj_angvel", "lv3", MAX_OBJ, False),
    ("joint_q", "ls", MAX_JOINT, False),
    ("joint_v", "ls", MAX_JOINT, False),
    ("attached", "ls", MAX_OBJ, False),
    ("attach_off", "lv3", MAX_OBJ, False),
    ("unanchored", "ls", MAX_OBJ, False),
    ("hooked", "ls", MAX_JOINT, False),
    ("hook_off", "ls", MAX_JOINT, False),
    ("hook_hoff", "lv3", MAX_JOINT, False),
    ("pad_force_l", "s", 1, False),
    ("pad_force_r", "s", 1, False),
    ("fixture_pos", "v3", 1, False),
]

_TUP = {"v2": 2, "v3": 3, "lv2": 2, "lv3": 3, "lv4": 4}


def _spec_rows(spec):
    n = 0
    for _, kind, count, _ in spec:
        if kind == "s":
            n += 1
        elif kind in ("v2", "v3"):
            n += _TUP[kind]
        elif kind == "ls":
            n += count
        else:
            n += count * _TUP[kind]
    return n


SC_ROWS = _spec_rows(_SC_SPEC)
SIM_ROWS = _spec_rows(_SIM_SPEC)


def _emit_lanes(spec, get):
    """Yield lanes in canonical row order. `get(name)` returns the value as
    stored in the lane container (scalar lane / tuple / list / list of
    tuples)."""
    for name, kind, count, _ in spec:
        v = get(name)
        if kind == "s":
            yield v
        elif kind in ("v2", "v3"):
            for x in v:
                yield x
        elif kind == "ls":
            for i in range(count):
                yield v[i]
        else:
            for i in range(count):
                for x in v[i]:
                    yield x


def _build_lanes(spec, take):
    """Inverse of _emit_lanes: consume lanes in canonical order, rebuilding
    the container structure (with bool casts where flagged)."""
    out = {}
    for name, kind, count, as_bool in spec:
        conv = (lambda x: x != 0.0) if as_bool else (lambda x: x)
        if kind == "s":
            out[name] = conv(take())
        elif kind in ("v2", "v3"):
            out[name] = tuple(conv(take()) for _ in range(_TUP[kind]))
        elif kind == "ls":
            out[name] = [conv(take()) for _ in range(count)]
        else:
            out[name] = [tuple(conv(take()) for _ in range(_TUP[kind]))
                         for _ in range(count)]
    return out


class _Cursor:
    """Sequential row reader. `rows2d=True` (the kernel) yields (1, B) row
    slices — Mosaic vectors want >=2 dims; the lane math is shape-agnostic."""

    def __init__(self, ref, rows2d=False):
        self.ref = ref
        self.i = 0
        self.rows2d = rows2d

    def take(self):
        v = self.ref[self.i:self.i + 1, :] if self.rows2d else self.ref[self.i]
        self.i += 1
        return v


def pack_scene_rows(scene: SceneParams) -> jnp.ndarray:
    """SceneParams (batched (N, ...)) -> (SC_ROWS, N) f32 — done once at
    vector-engine build time."""
    sc = engine_lanes.scene_lanes(scene)
    lanes = [jnp.asarray(x, jnp.float32)
             for x in _emit_lanes(_SC_SPEC, lambda n: getattr(sc, n))]
    return jnp.stack(lanes, axis=0)


def pack_sim_rows(sim: SimState) -> jnp.ndarray:
    """SimState (batched) -> (SIM_ROWS, N) f32."""
    st = engine_lanes.sim_lanes(sim)
    lanes = [jnp.asarray(x, jnp.float32)
             for x in _emit_lanes(_SIM_SPEC, lambda n: st[n])]
    return jnp.stack(lanes, axis=0)


def unpack_sim_rows(rows: jnp.ndarray, mocap) -> SimState:
    cur = _Cursor(rows)
    st = _build_lanes(_SIM_SPEC, cur.take)
    pad_l, pad_r = engine_lanes._pad_centers(st["hand"], st["gripper"])
    pads = (engine_lanes._stack_last(pad_l), engine_lanes._stack_last(pad_r))
    return engine_lanes.lanes_to_sim(st, mocap, pads)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# Specialized substep variants the kernel switches between per block.
# Blocks are task-contiguous in the fused batch, so most blocks exercise a
# single feature family; the variant skips the others' instructions
# entirely (lax.switch lowers to a real branch in Mosaic). Encoding:
#   0 = free objects only, no hand-blocking boxes   (reach/push/pick...)
#   1 = free objects only, with hand-blocking boxes (wall scenes)
#   2 = fixture joints (+boxes), no free objects    (buttons/doors/...)
#   3 = everything                                  (hammer, mixed blocks)
_VARIANTS = (
    dict(with_objects=True, with_joints=False, with_hand_boxes=False),
    dict(with_objects=True, with_joints=False, with_hand_boxes=True),
    dict(with_objects=False, with_joints=True, with_hand_boxes=True),
    dict(with_objects=True, with_joints=True, with_hand_boxes=True),
)


def block_variants(scene: SceneParams, n_pad: int, block: int) -> tuple:
    """STATIC per-block variant ids from the per-slot scene features. The
    fused batch's task layout is fixed at build time, so specialization is
    a trace-time decision: control_step launches one switch-free kernel per
    contiguous same-variant run of blocks (a runtime lax.switch carrying
    all four variants in one kernel costs more than it saves — measured
    +25% on the generic path)."""
    import numpy as np
    obj = np.asarray(scene.obj_exists).any(axis=-1)
    joint = np.asarray(scene.joint_exists).any(axis=-1)
    blk = (np.asarray(scene.static_exists)
           * np.asarray(scene.static_blocks_hand)).any(axis=-1)

    def pad1(x):
        return np.pad(x, (0, n_pad - x.shape[0]), mode="edge")

    obj, joint, blk = pad1(obj), pad1(joint), pad1(blk)
    nb = n_pad // block
    ids = []
    for b in range(nb):
        s = slice(b * block, (b + 1) * block)
        o, j, k = bool(obj[s].any()), bool(joint[s].any()), bool(blk[s].any())
        ids.append((3 if o else 2) if j else (1 if k else 0))
    return tuple(ids)


@functools.lru_cache(maxsize=None)
def _make_kernel(variant: int):
    flags = _VARIANTS[variant]

    def _kernel(scene_ref, state_ref, ctl_ref, out_ref):
        target = (ctl_ref[0:1, :], ctl_ref[1:2, :], ctl_ref[2:3, :])
        effort = ctl_ref[3:4, :]
        sc = _NS(**_build_lanes(_SC_SPEC, _Cursor(scene_ref, rows2d=True).take))
        st = _build_lanes(_SIM_SPEC, _Cursor(state_ref, rows2d=True).take)
        for _ in range(FRAME_SKIP):
            st = engine_lanes._substep(sc, st, target, effort, **flags)
        for i, lane in enumerate(_emit_lanes(_SIM_SPEC, lambda n: st[n])):
            out_ref[i:i + 1, :] = lane.astype(jnp.float32)

    _kernel.__name__ = f"_step_kernel_v{variant}"
    return _kernel


def _variant_runs(variants):
    """Merge adjacent equal variant ids into (vid, start_block, n_blocks)."""
    runs = []
    for b, v in enumerate(variants):
        if runs and runs[-1][0] == v:
            runs[-1] = (v, runs[-1][1], runs[-1][2] + 1)
        else:
            runs.append((v, b, 1))
    return runs


def _pad_to(x, n, axis):
    have = x.shape[axis]
    if have == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - have)
    return jnp.pad(x, pad, mode="edge")


def control_step(scene: SceneParams, scene_rows, sim: SimState, action, *,
                 block=1024, interpret=False, variants=None) -> SimState:
    """Drop-in batched control step: same semantics as
    engine_lanes.control_step, physics substeps inside one Pallas kernel.

    `variants` is the per-block specialization id table (block_variants);
    pass None to run every block through the generic all-features variant."""
    a = jnp.clip(action[..., :3], -1.0, 1.0)
    mocap = jnp.clip(sim.mocap + a * ACTION_SCALE, scene.mocap_low,
                     scene.mocap_high)
    effort = action[..., 3]
    target = (mocap + jnp.asarray(engine.TCP_OFFSET)
              + engine_lanes.reach_target_delta(mocap))
    ctl = jnp.stack([target[..., 0], target[..., 1], target[..., 2], effort],
                    axis=0).astype(jnp.float32)
    state_rows = pack_sim_rows(sim)

    n = state_rows.shape[1]
    n_pad = -(-n // block) * block
    state_rows = _pad_to(state_rows, n_pad, 1)
    ctl = _pad_to(ctl, n_pad, 1)
    scene_rows = _pad_to(scene_rows, n_pad, 1)
    nb = n_pad // block
    if variants is None:
        variants = (3,) * nb
    assert len(variants) == nb

    def call_run(vid, lo, cnt):
        sl = slice(lo * block, (lo + cnt) * block)
        return pl.pallas_call(
            _make_kernel(vid),
            grid=(cnt,),
            in_specs=[
                pl.BlockSpec((SC_ROWS, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SIM_ROWS, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SIM_ROWS, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SIM_ROWS, cnt * block),
                                           jnp.float32),
            interpret=interpret,
        )(scene_rows[:, sl], state_rows[:, sl], ctl[:, sl])

    parts = [call_run(vid, lo, cnt) for vid, lo, cnt in _variant_runs(variants)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return unpack_sim_rows(out[:, :n], mocap)
