import numpy as np
import jax.numpy as jnp

from tpu3d.config import SfMConfig, CameraConfig, RansacConfig
from tpu3d.core import lie
from tpu3d.sfm import IncrementalSfM, PairObservations


def build_synthetic_sequence(rng, n_cams=5, n_pts=600, focal=800.0, noise=0.2, cap=1024):
    """Cameras on an arc viewing a blob of points; exact correspondences
    with global track ids, packaged as padded PairObservations."""
    X = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts),
                  rng.uniform(6, 10, n_pts)], -1).astype(np.float32)
    cams = []
    for c in range(n_cams):
        w = np.array([0.0, 0.06 * c - 0.1, 0.0], np.float32)
        t = np.array([0.5 * c - 1.0, 0.03 * c, 0.02 * c], np.float32)
        cams.append(np.concatenate([w, t]))
    cams = np.stack(cams)

    uvs = []
    vis = []
    for c in range(n_cams):
        R = np.asarray(lie.so3_exp(jnp.asarray(cams[c, :3])))
        Xc = X @ R.T + cams[c, 3:]
        uv = focal * Xc[:, :2] / Xc[:, 2:3]
        uv += rng.normal(0, noise, uv.shape)
        uvs.append(uv.astype(np.float32))
        vis.append((np.abs(uv[:, 0]) < 900) & (np.abs(uv[:, 1]) < 600) & (Xc[:, 2] > 0.5))

    pairs = []
    for c in range(n_cams - 1):
        visible = vis[c] & vis[c + 1]
        ids = np.flatnonzero(visible)
        m = len(ids)
        pad = cap - m
        track = np.concatenate([ids, -np.ones(pad, np.int64)])
        uv0 = np.concatenate([uvs[c][ids], np.zeros((pad, 2), np.float32)])
        uv1 = np.concatenate([uvs[c + 1][ids], np.zeros((pad, 2), np.float32)])
        valid = np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
        pairs.append(
            PairObservations(
                img0=c, img1=c + 1,
                idx0=track.copy(), idx1=track.copy(),
                track=track, uv0=uv0, uv1=uv1, valid=valid,
                colors0=np.zeros((cap, 3), np.uint8),
            )
        )
    return X, cams, pairs, focal


def align_similarity(A, B):
    """Umeyama similarity alignment A -> B. Returns aligned A."""
    muA, muB = A.mean(0), B.mean(0)
    A0, B0 = A - muA, B - muB
    U, S, Vt = np.linalg.svd(A0.T @ B0)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1, 1, d])
    R = (U @ D @ Vt).T
    s = np.trace(np.diag(S) @ D) / np.sum(A0**2)
    return s * A0 @ R.T + muB


def test_incremental_engine_full_sequence(rng):
    X, cams_gt, pairs, focal = build_synthetic_sequence(rng)
    cfg = SfMConfig(
        camera=CameraConfig(focal_length=focal),
        ransac=RansacConfig(num_hypotheses=256),
        max_tracks=5000,
        global_ba_every=3,
    )
    engine = IncrementalSfM(n_images=5, config=cfg)
    for p in pairs:
        info = engine.register_pair(p)
        assert info["status"] == "registered", info
    rec = engine.finalize([f"img{i}" for i in range(5)])

    assert len(rec.registered) == 5
    assert rec.mean_reproj_px < 1.0
    assert len(rec.points) > 400

    # Camera centers match ground truth up to a similarity transform.
    def centers(cams6):
        R = np.stack([np.asarray(lie.so3_exp(jnp.asarray(c[:3]))) for c in cams6])
        t = cams6[:, 3:]
        return -np.einsum("nji,nj->ni", R, t)

    c_est = centers(rec.cams)
    c_gt = centers(cams_gt)
    c_al = align_similarity(c_est, c_gt)
    spread = np.linalg.norm(c_gt - c_gt.mean(0), axis=1).mean()
    err = np.linalg.norm(c_al - c_gt, axis=1).mean()
    assert err < 0.05 * spread


def test_engine_rejects_garbage_pair(rng):
    X, cams_gt, pairs, focal = build_synthetic_sequence(rng)
    cfg = SfMConfig(camera=CameraConfig(focal_length=focal),
                    ransac=RansacConfig(num_hypotheses=128), max_tracks=5000)
    engine = IncrementalSfM(n_images=5, config=cfg)
    engine.register_pair(pairs[0])
    # Scramble pair 1's uv1 -> no consistent epipolar geometry.
    bad = pairs[1]
    uv1 = bad.uv1.copy()
    rng.shuffle(uv1)
    bad = PairObservations(bad.img0, bad.img1, bad.idx0, bad.idx1, bad.track,
                           bad.uv0, uv1, bad.valid, bad.colors0)
    info = engine.register_pair(bad)
    assert info["status"].startswith("rejected")
    assert not engine.has_cam[2]


def test_deregister_weak_cameras(rng):
    """A camera whose observation support is thin/inconsistent gets dropped
    by the integrity gate; healthy cameras survive."""
    X, cams_gt, pairs, focal = build_synthetic_sequence(rng)
    cfg = SfMConfig(camera=CameraConfig(focal_length=focal),
                    ransac=RansacConfig(num_hypotheses=128), max_tracks=5000,
                    global_ba_every=100)
    engine = IncrementalSfM(n_images=5, config=cfg)
    for p in pairs:
        assert engine.register_pair(p)["status"] == "registered"
    n0 = engine.num_registered
    # Corrupt camera 3's pose: its observations now have huge residuals.
    engine.cams[3, 3:6] += 50.0
    dropped = engine.deregister_weak_cameras(min_obs=8, max_median_px=8.0)
    assert len(dropped) >= 1
    assert not engine.has_cam[3]
    assert engine.num_registered == n0 - len(dropped)
    # Healthy anchor cameras survive.
    assert engine.has_cam[0] and engine.has_cam[1]


def test_presize_global_ba_exact_buckets():
    """presize_global_ba sets the padded high-water marks to the bucket-
    rounded exact bounds (r5: the generic 2x accelerator guess was
    exceeded by the canonical match graph, doubling mid-run and costing
    ~1.8x padded compute per LM iteration for the rest of the run)."""
    engine = IncrementalSfM(n_images=290, config=SfMConfig(max_tracks=5000))
    engine.presize_global_ba(347_735, 77_838)
    hw = engine._gba_shapes.hw
    # ceil(347735 * 1.02 / 16384) * 16384
    assert hw["O"] == 360_448
    assert hw["P"] == 81_920
    # pad() returns the pre-sized shape without growth for anything under
    # the bound, and still grows geometrically past it.
    assert engine._gba_shapes.pad("O", 347_735, 16384) == 360_448
    assert engine._gba_shapes.pad("O", 400_000, 16384) == 720_896
    # Tiny bounds never shrink below one bucket.
    e2 = IncrementalSfM(n_images=8, config=SfMConfig(max_tracks=5000))
    e2.presize_global_ba(10, 3)
    assert e2._gba_shapes.hw["O"] == 16384
    assert e2._gba_shapes.hw["P"] == 4096
