"""Matching-state persistence roundtrip (tpu3d/io/matches.py)."""
import numpy as np

from tpu3d.io.matches import load_matches, save_matches
from tpu3d.matching import TrackStore
from tpu3d.sfm.engine import EdgeObservations, ImageRegistration


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ts = TrackStore(6, 32, capacity=1000)
    regs = []
    adj = {0: [1, 2], 1: [0], 2: [0], 3: [], 4: [5], 5: [4]}
    for j, ref in [(1, 0), (2, 0), (5, 4)]:
        m = 10
        i0 = rng.choice(32, m, replace=False).astype(np.int64)
        i1 = rng.choice(32, m, replace=False).astype(np.int64)
        tr = ts.union_pair(ref, j, i0, i1)
        regs.append(ImageRegistration(img=j, edges=[EdgeObservations(
            ref_img=ref, idx_ref=i0, idx_new=i1, track=tr,
            uv_ref=rng.normal(0, 100, (m, 2)).astype(np.float32),
            uv_new=rng.normal(0, 100, (m, 2)).astype(np.float32),
            colors_ref=rng.integers(0, 255, (m, 3)).astype(np.uint8),
            rel_R=np.eye(3, dtype=np.float32),
            rel_t=np.asarray([1, 0, 0], np.float32),
        )]))
    # one edge without a relative pose
    regs[1].edges[0].rel_R = None
    regs[1].edges[0].rel_t = None
    save_matches(str(tmp_path), regs, ts, adj, seconds=1.0)

    out = load_matches(str(tmp_path), 6, 32, 1000)
    assert out is not None
    regs2, ts2, adj2 = out
    assert adj2 == {int(k): list(v) for k, v in adj.items()}
    assert ts2.next_track == ts.next_track
    np.testing.assert_array_equal(ts2.kp_track, ts.kp_track)
    np.testing.assert_array_equal(ts2.resolve(ts2.kp_track), ts.resolve(ts.kp_track))
    for a, b in zip(regs, regs2):
        assert a.img == b.img
        for ea, eb in zip(a.edges, b.edges):
            assert ea.ref_img == eb.ref_img
            np.testing.assert_array_equal(ea.idx_ref, eb.idx_ref)
            np.testing.assert_array_equal(ea.track, eb.track)
            np.testing.assert_allclose(ea.uv_new, eb.uv_new)
            if ea.rel_R is None:
                assert eb.rel_R is None
            else:
                np.testing.assert_allclose(ea.rel_R, eb.rel_R)


def test_load_missing_returns_none(tmp_path):
    assert load_matches(str(tmp_path), 4, 8, 100) is None
