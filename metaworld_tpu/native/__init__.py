"""Native runtime components (C++), built on first use with g++.

TrajectoryWriter: async rollout sink — pushes pytree batches into a native
ring buffer whose background thread writes framed records to disk, so the
device step loop never blocks on IO. TrajectoryReader replays the records.
"""

from __future__ import annotations

import ctypes
import io
import pathlib
import struct
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "_trajstore.bin.so"  # dotted name: not an importable module candidate
_MAGIC = 0x4D57545053544F52


def _build() -> pathlib.Path:
    src = _DIR / "trajstore.cpp"
    if _SO.exists() and _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
         str(src), "-o", str(_SO)],
        check=True,
    )
    return _SO


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        lib.ts_create.restype = ctypes.c_void_p
        lib.ts_create.argtypes = [ctypes.c_uint64, ctypes.c_char_p]
        lib.ts_push.restype = ctypes.c_int
        lib.ts_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
        lib.ts_flush.argtypes = [ctypes.c_void_p]
        lib.ts_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
        lib.ts_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def _pack(arrays: dict[str, np.ndarray]) -> bytes:
    """npz-lite framing: [n][per-entry: name, dtype, shape, raw bytes]."""
    out = io.BytesIO()
    out.write(struct.pack("<I", len(arrays)))
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        nb = name.encode()
        dt = arr.dtype.str.encode()
        out.write(struct.pack("<I", len(nb)))
        out.write(nb)
        out.write(struct.pack("<I", len(dt)))
        out.write(dt)
        out.write(struct.pack("<I", arr.ndim))
        out.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
        out.write(arr.tobytes())
    return out.getvalue()


def _unpack(data: bytes) -> dict[str, np.ndarray]:
    buf = io.BytesIO(data)
    (n,) = struct.unpack("<I", buf.read(4))
    out = {}
    for _ in range(n):
        (ln,) = struct.unpack("<I", buf.read(4))
        name = buf.read(ln).decode()
        (ld,) = struct.unpack("<I", buf.read(4))
        dtype = np.dtype(buf.read(ld).decode())
        (nd,) = struct.unpack("<I", buf.read(4))
        shape = struct.unpack(f"<{nd}q", buf.read(8 * nd))
        count = int(np.prod(shape)) if nd else 1
        arr = np.frombuffer(buf.read(count * dtype.itemsize), dtype=dtype)
        out[name] = arr.reshape(shape)
    return out


class TrajectoryWriter:
    """Async rollout sink backed by the native ring buffer."""

    def __init__(self, path: str, capacity_mb: int = 256):
        self._lib = _load()
        self._h = self._lib.ts_create(capacity_mb * 1024 * 1024, str(path).encode())

    def write(self, arrays: dict[str, np.ndarray]) -> bool:
        """Queue one record; returns False if the ring was full (dropped)."""
        blob = _pack(arrays)
        return self._lib.ts_push(self._h, blob, len(blob)) == 0

    def flush(self):
        self._lib.ts_flush(self._h)

    def stats(self) -> dict[str, int]:
        out = (ctypes.c_uint64 * 3)()
        self._lib.ts_stats(self._h, out)
        return {"pushed": out[0], "dropped": out[1], "bytes_written": out[2]}

    def close(self):
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class TrajectoryReader:
    """Iterates records written by TrajectoryWriter."""

    def __init__(self, path: str):
        self.path = path

    def __iter__(self):
        with open(self.path, "rb") as f:
            while True:
                hdr = f.read(16)
                if len(hdr) < 16:
                    return
                magic, nbytes = struct.unpack("<QQ", hdr)
                assert magic == _MAGIC, "corrupt record"
                yield _unpack(f.read(nbytes))
