"""Dense-side camera gate (DenseConfig.camera_gate, VERDICT r3 #2): train
cameras whose probe loss is a robust outlier — wrong-pose supervision the
grid cannot fit — are dropped from the remaining epochs' sampling."""
import numpy as np
import pytest

from tpu3d.config import DenseConfig
from tpu3d.dense.train import LAST_TRAIN_AUX, RayDataset, train_plenoxel


def _dataset(rng, n_per_cam=512, n_cams=5, bad_cam=None):
    """Cameras 0..n-2 consistently supervise a mid-gray scene; `bad_cam`
    (if set) supervises pure noise — the unfittable residual a wrong-pose
    camera produces."""
    o, d, rgb, cid = [], [], [], []
    for c in range(n_cams):
        oc = rng.uniform(-0.2, 0.2, (n_per_cam, 3)).astype(np.float32)
        dc = rng.normal(0, 1, (n_per_cam, 3)).astype(np.float32)
        dc /= np.linalg.norm(dc, axis=-1, keepdims=True)
        if c == bad_cam:
            col = rng.integers(0, 2, (n_per_cam, 3)).astype(np.float32)
        else:
            col = np.full((n_per_cam, 3), 0.5, np.float32)
            col += rng.normal(0, 0.02, col.shape).astype(np.float32)
        o.append(oc); d.append(dc); rgb.append(col)
        cid.append(np.full(n_per_cam, c, np.int32))
    return RayDataset(np.concatenate(o), np.concatenate(d),
                      np.concatenate(rgb), np.concatenate(cid))


def _cfg(**kw):
    # min_keep 0.7: the default 0.85 floors max_drop to 0 at 5 cameras
    # (int(0.15 * 5) == 0) — the budget only bites at dataset scale.
    base = dict(grid_resolution=16, num_samples=24, near=0.1, far=2.0,
                scene_scale=1.0, batch_size=256, epochs=4, scan_chunk=1,
                learning_rate=0.3, camera_gate=True, camera_gate_epoch=2,
                camera_gate_probe_rays=256, camera_gate_min_keep=0.7,
                lr_milestones=(100,))
    base.update(kw)
    return DenseConfig(**base)


def test_gate_drops_inconsistent_camera(rng):
    ds = _dataset(rng, bad_cam=3)
    grid, losses = train_plenoxel(ds, _cfg(), verbose=False, log_every=1,
                                  packed=False)
    assert LAST_TRAIN_AUX["dropped_cameras"] == [3]
    assert np.isfinite(losses).all()


def test_gate_keeps_consistent_cameras(rng):
    ds = _dataset(rng, bad_cam=None)
    train_plenoxel(ds, _cfg(), verbose=False, log_every=1, packed=False)
    assert LAST_TRAIN_AUX["dropped_cameras"] == []


def test_gate_respects_min_keep(rng):
    """Even if many cameras look bad, the gate never drops below the
    min_keep fraction (here: at most 1 of 5)."""
    ds = _dataset(rng, bad_cam=3)
    # make a second camera bad too
    bad2 = ds.cam_ids == 1
    rgb = ds.rgb.copy()
    rgb[bad2] = rng.integers(0, 2, (bad2.sum(), 3)).astype(np.float32)
    ds = ds._replace(rgb=rgb)
    train_plenoxel(ds, _cfg(camera_gate_min_keep=0.8), verbose=False,
                   log_every=1, packed=False)
    assert len(LAST_TRAIN_AUX["dropped_cameras"]) <= 1
