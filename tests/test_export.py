"""Reference output/-protocol exporter tests (io/reference_export.py).

Validates the exported files load exactly the way the reference's own
consumers load them (np.load object arrays, ragged per-image rows,
(M,3,4) extrinsics, ascii PLY)."""
import os

import numpy as np
import pytest

from tpu3d.io.artifacts import ArtifactStore
from tpu3d.io.reference_export import export_reference_layout


@pytest.fixture
def fake_artifacts(tmp_path):
    rng = np.random.default_rng(0)
    n_img, K = 4, 32
    store = ArtifactStore(str(tmp_path))
    valid = np.zeros((n_img, K), bool)
    for i in range(n_img):
        valid[i, : 8 + i] = True
    store.save(
        "features",
        keypoints=rng.normal(0, 100, (n_img, K, 2)).astype(np.float32),
        keypoints_px=rng.uniform(0, 200, (n_img, K, 2)).astype(np.float32),
        descriptors=rng.normal(0, 1, (n_img, K, 128)).astype(np.float32),
        valid=valid,
        colors_bgr=rng.integers(0, 255, (n_img, K, 3)).astype(np.uint8),
        image_size=np.tile([200.0, 100.0], (n_img, 1)).astype(np.float32),
    )
    store.save_json("features_meta", {"names": [f"im{i}.jpg" for i in range(n_img)],
                                      "downscale": 2})
    pts = rng.normal(0, 1, (50, 3)).astype(np.float32)
    store.save(
        "reconstruction",
        cams=rng.normal(0, 0.1, (3, 6)).astype(np.float32),
        registered=np.array([0, 1, 2]),
        points=pts,
        colors_bgr=rng.integers(0, 255, (50, 3)).astype(np.uint8),
        track_ids=np.arange(50),
        extrinsics=np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1)),
    )
    store.save_json("reconstruction_meta", {
        "registered_names": ["im0.jpg", "im1.jpg", "im2.jpg"],
        "mean_reproj_px": 0.5, "num_obs": 100, "mode": "incremental",
        "seconds": 1.0,
    })
    return str(tmp_path)


def test_export_reference_layout(fake_artifacts, tmp_path):
    out = str(tmp_path / "output")
    written = export_reference_layout(fake_artifacts, out)
    assert written

    names = open(os.path.join(out, "img_list.txt")).read().splitlines()
    assert names == [f"im{i}.jpg" for i in range(4)]

    # Ragged object arrays, loaded the way the reference's matching.py /
    # sfm.py load them.
    ap = np.load(os.path.join(out, "all_points.npy"), allow_pickle=True)
    ad = np.load(os.path.join(out, "all_descriptors.npy"), allow_pickle=True)
    ac = np.load(os.path.join(out, "all_colors.npy"), allow_pickle=True)
    assert len(ap) == 4 and ap[0].shape == (8, 2) and ap[3].shape == (11, 2)
    assert ad[1].shape == (9, 128) and ac[2].shape == (10, 3)
    sz = np.load(os.path.join(out, "img_size.npy"))
    assert sz.shape == (4, 2)

    rec_names = open(os.path.join(out, "reconstructed_img.txt")).read().splitlines()
    assert rec_names == ["im0.jpg", "im1.jpg", "im2.jpg"]
    ext = np.load(os.path.join(out, "cameras_extrinsic.npy"))
    assert ext.shape == (3, 3, 4)
    p3d = np.load(os.path.join(out, "points_3d.npy"))
    assert p3d.shape == (50, 3)
    ply = open(os.path.join(out, "result.ply")).read()
    assert ply.startswith("ply\nformat ascii 1.0")


def test_export_codebook_reference_retrieval_roundtrip(fake_artifacts, tmp_path):
    """The exported bow_codebook.plk must satisfy the reference matching.py's
    consumer: joblib load of a (k, codebook) tuple (matching.py:16) and the
    vq + tf-idf retrieval math on the exported descriptors (matching.py:26-45)."""
    joblib = pytest.importorskip("joblib")
    from scipy.cluster.vq import vq

    out = str(tmp_path / "output")
    written = export_reference_layout(fake_artifacts, out)
    # 4 imgs x (8..11) valid kpts = 38 descriptors < 200 -> k clamps
    assert written.get("bow_codebook.plk") == 38

    k, codebook = joblib.load(os.path.join(out, "bow_codebook.plk"))
    assert k == 38 and codebook.shape == (38, 128)
    assert np.isfinite(codebook).all()

    # the reference's retrieval loop on the exported ragged descriptors
    descs = np.load(os.path.join(out, "all_descriptors.npy"), allow_pickle=True)
    n = len(descs)
    tf = np.zeros((n, k))
    for i in range(n):
        words, _ = vq(descs[i].astype(np.float64), codebook.astype(np.float64))
        for w in words:
            tf[i, w] += 1
    df = (tf > 0).sum(axis=0)
    idf = np.log(n / np.maximum(df, 1))
    vecs = tf * idf
    norms = np.linalg.norm(vecs, axis=1)
    assert (norms > 0).all()  # every image lands on some codewords


def test_export_real_artifacts_roundtrip(tmp_path):
    """End-to-end on the committed small verify artifacts when present."""
    src = "/tmp/v"
    if not os.path.exists(os.path.join(src, "features.npz")):
        pytest.skip("no local verify artifacts")
    out = str(tmp_path / "output")
    written = export_reference_layout(src, out)
    assert "img_pairs/all_matches" in written
    pairs = np.load(os.path.join(out, "img_pairs.npy"))
    matches = np.load(os.path.join(out, "all_matches.npy"), allow_pickle=True)
    assert len(pairs) == len(matches) > 0
    idx_ref, idx_new, track = matches[0, 0], matches[0, 1], matches[0, 2]
    assert len(idx_ref) == len(idx_new) == len(track)
