"""Native (C++) async trajectory store: pack/unpack fidelity, ring-buffer
stats, threaded writer flush (metaworld_tpu/native)."""

import numpy as np

from metaworld_tpu.native import TrajectoryReader, TrajectoryWriter


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "d.ts")
    recs = []
    with TrajectoryWriter(path, capacity_mb=4) as w:
        for i in range(20):
            rec = {
                "obs": np.random.default_rng(i).standard_normal((8, 39)).astype(np.float32),
                "reward": np.full(8, float(i)),
                "step": np.array([i], dtype=np.int64),
            }
            recs.append(rec)
            assert w.write(rec)
        w.flush()
        stats = w.stats()
    assert stats["pushed"] == 20 and stats["dropped"] == 0
    assert stats["bytes_written"] > 0
    back = list(TrajectoryReader(path))
    assert len(back) == 20
    for a, b in zip(recs, back):
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
            assert a[k].dtype == b[k].dtype


def test_large_batches_do_not_block(tmp_path):
    path = str(tmp_path / "big.ts")
    big = {"obs": np.zeros((4096, 39), np.float32)}
    with TrajectoryWriter(path, capacity_mb=64) as w:
        for _ in range(50):
            w.write(big)
        w.flush()
        st = w.stats()
    assert st["pushed"] == 50
    assert st["bytes_written"] >= 50 * big["obs"].nbytes
