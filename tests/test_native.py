"""Native (C++) host-runtime vs pure-Python equivalence."""
import numpy as np
import pytest

from tpu3d import native
from tpu3d.matching import TrackStore


pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def _random_pairs(rng, n_img=12, K=64, n_pairs=40):
    pairs = []
    for _ in range(n_pairs):
        i, j = rng.choice(n_img, 2, replace=False)
        m = rng.integers(4, K // 2)
        idx0 = rng.choice(K, m, replace=False)
        idx1 = rng.choice(K, m, replace=False)
        pairs.append((int(i), int(j), idx0.astype(np.int64), idx1.astype(np.int64)))
    return pairs


def test_union_pair_equivalence():
    rng = np.random.default_rng(7)
    pairs = _random_pairs(rng)
    ts_py = TrackStore(12, 64, capacity=10_000, use_native=False)
    ts_c = TrackStore(12, 64, capacity=10_000, use_native=True)
    assert ts_c._native is not None
    for i, j, idx0, idx1 in pairs:
        out_py = ts_py.union_pair(i, j, idx0, idx1)
        out_c = ts_c.union_pair(i, j, idx0, idx1)
        # canonical ids must match after resolve (path-compression state
        # may differ transiently; roots must agree)
        np.testing.assert_array_equal(ts_py.resolve(out_py), ts_c.resolve(out_c))
    assert ts_py.next_track == ts_c.next_track
    np.testing.assert_array_equal(ts_py.resolve(ts_py.kp_track), ts_c.resolve(ts_c.kp_track))


def test_resolve_equivalence():
    rng = np.random.default_rng(3)
    ts_py = TrackStore(6, 32, capacity=1000, use_native=False)
    ts_c = TrackStore(6, 32, capacity=1000, use_native=True)
    for i, j, idx0, idx1 in _random_pairs(rng, 6, 32, 15):
        ts_py.union_pair(i, j, idx0, idx1)
        ts_c.union_pair(i, j, idx0, idx1)
    ids = rng.integers(-1, ts_py.next_track, 500).astype(np.int64)
    np.testing.assert_array_equal(ts_py.resolve(ids), ts_c.resolve(ids))


def test_record_obs_first_wins():
    K = 16
    valid = np.zeros(4 * K, np.uint8)
    track = np.zeros(4 * K, np.int64)
    uv = np.zeros((4 * K, 2), np.float32)
    idx = np.array([3, 5, 3], np.int64)           # duplicate kpt 3
    tr = np.array([10, 11, 99], np.int64)
    uvs = np.array([[1, 2], [3, 4], [7, 7]], np.float32)
    n = native.record_obs(valid, track, uv, K, 2, idx, tr, uvs)
    assert n == 2                                  # dup not inserted
    assert valid[2 * K + 3] and track[2 * K + 3] == 10   # first wins
    assert tuple(uv[2 * K + 5]) == (3.0, 4.0)
    # second call with same keys inserts nothing
    assert native.record_obs(valid, track, uv, K, 2, idx, tr, uvs) == 0


def test_capacity_exceeded():
    ts = TrackStore(2, 8, capacity=4, use_native=True)
    with pytest.raises(RuntimeError):
        ts.union_pair(0, 1, np.arange(8), np.arange(8))
