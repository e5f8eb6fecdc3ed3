"""--register-all low-confidence registration (SfMConfig.register_all,
VERDICT r3 #6): after the final BA, still-unregistered images are placed by
relaxed relative-pose chaining and marked — never entering the BA gauge."""
import numpy as np
import pytest

from tpu3d.config import CameraConfig, SfMConfig
from tpu3d.core import lie
from tpu3d.sfm.engine import EdgeObservations, ImageRegistration, IncrementalSfM


FOCAL = 1000.0


def _engine(n_images=3):
    cfg = SfMConfig(camera=CameraConfig(focal_length=FOCAL),
                    register_all=True, backend="cpu")
    return IncrementalSfM(n_images, cfg)


def _edge(ref_img, n, rel_R, rel_t, tracks=None, uv_scale=50.0, rng=None):
    rng = rng or np.random.default_rng(0)
    uv = rng.uniform(-uv_scale, uv_scale, (n, 2)).astype(np.float32)
    return EdgeObservations(
        ref_img=ref_img,
        idx_ref=np.arange(n), idx_new=np.arange(n),
        track=(np.full(n, -1, np.int64) if tracks is None else tracks),
        uv_ref=uv, uv_new=uv + rng.normal(0, 0.5, (n, 2)).astype(np.float32),
        colors_ref=np.zeros((n, 3), np.uint8),
        rel_R=rel_R, rel_t=rel_t,
    )


def test_low_confidence_chained_registration():
    """An image whose edges carry only a relative pose (no usable track
    anchors) is unplaceable by every confident path, but the relaxed pass
    chains it off its registered reference at scale 1 and flags it."""
    eng = _engine(3)
    eng.cams[0] = np.asarray([0, 0, 0, 0.1, 0.0, 0.2], np.float32)
    eng.has_cam[0] = True
    eng.num_registered = 1

    w = np.asarray([0.03, -0.05, 0.02], np.float32)
    rel_R = lie.so3_exp_np(w)
    rel_t = np.asarray([0.4, 0.0, 0.1], np.float32)
    reg = ImageRegistration(img=2, edges=[_edge(0, 20, rel_R, rel_t)])

    placed = eng.register_low_confidence([reg], verbose=False)
    assert placed == [2]
    assert eng.has_cam[2]
    # chained pose: R_2 = rel_R @ R_0, t_2 = rel_R t_0 + rel_t
    R0 = lie.so3_exp_np(eng.cams[0, :3])
    R2 = lie.so3_exp_np(eng.cams[2, :3])
    np.testing.assert_allclose(R2, rel_R @ R0, atol=1e-5)
    np.testing.assert_allclose(eng.cams[2, 3:], rel_R @ eng.cams[0, 3:] + rel_t,
                               atol=1e-5)


def test_low_confidence_chains_across_rounds():
    """Image 2 chains off image 1, which itself only registers in the
    low-confidence pass — the multi-round loop resolves the dependency."""
    eng = _engine(3)
    eng.cams[0] = np.zeros(6, np.float32)
    eng.has_cam[0] = True
    eng.num_registered = 1
    I = np.eye(3, dtype=np.float32)
    t1 = np.asarray([0.3, 0, 0], np.float32)
    t2 = np.asarray([0.2, 0.1, 0], np.float32)
    regs = [ImageRegistration(img=2, edges=[_edge(1, 12, I, t2)]),
            ImageRegistration(img=1, edges=[_edge(0, 12, I, t1)])]
    placed = eng.register_low_confidence(regs, verbose=False)
    assert sorted(placed) == [1, 2]
    np.testing.assert_allclose(eng.cams[1, 3:], t1, atol=1e-6)
    np.testing.assert_allclose(eng.cams[2, 3:], t1 + t2, atol=1e-6)


def test_low_confidence_cameras_carry_no_observations():
    """Placed low-confidence cameras must not contribute observations —
    the BA problem gatherer sees nothing from them."""
    eng = _engine(3)
    eng.cams[0] = np.zeros(6, np.float32)
    eng.has_cam[0] = True
    eng.num_registered = 1
    reg = ImageRegistration(
        img=1, edges=[_edge(0, 10, np.eye(3, dtype=np.float32),
                            np.asarray([0.2, 0, 0], np.float32))])
    eng.register_low_confidence([reg])
    assert eng.has_cam[1]
    assert eng._gather_global_problem() is None  # zero observations total


def test_registration_unaffected_when_all_register():
    """register_all must be a no-op when the confident engine already
    registered everything (finalize passes an empty missing set)."""
    eng = _engine(2)
    eng.has_cam[:] = True
    eng.num_registered = 2
    regs = [ImageRegistration(img=0, edges=[]),
            ImageRegistration(img=1, edges=[])]
    assert eng.register_low_confidence(regs) == []
