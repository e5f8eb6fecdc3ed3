"""End-to-end wiring tests for the learned front-end path.

The published DISK/LightGlue checkpoints cannot be downloaded in this
offline environment, so these tests exercise the FULL pipeline dispatch
(config -> run_extraction -> _batch_match_pairs) with randomly initialized,
shape-correct weights: they validate the plumbing, padding/masking,
batching and packed-result protocol — everything except the learned
weights themselves. Dropping a real checkpoint into --frontend-weights /
--matcher-weights is then a pure data change.
(Reference production path: feature_extraction.py:28 DISK,
matching.py:122 LightGlue.)
"""
import dataclasses
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpu3d.config import (  # noqa: E402
    FrontendConfig, MatchingConfig, PipelineConfig,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Six 96x128 images: a textured pattern under small shifts, so nearby
    images genuinely overlap."""
    from PIL import Image

    rng = np.random.default_rng(3)
    base = (rng.uniform(0, 255, (160, 200, 3))).astype(np.uint8)
    # blur-ish structure: box-filter the noise so gradients are detectable
    base = (base.astype(np.float32) + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3.0
    d = tmp_path_factory.mktemp("imgs")
    for i in range(6):
        crop = base[i * 4 : i * 4 + 96, i * 6 : i * 6 + 128].astype(np.uint8)
        Image.fromarray(crop).save(os.path.join(str(d), f"im{i:02d}.png"))
    return str(d)


@pytest.fixture(scope="module")
def disk_weights(tmp_path_factory):
    from tpu3d.features.disk import DiskUNet
    from tpu3d.features.learned import save_params_npz

    params = DiskUNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    path = str(tmp_path_factory.mktemp("w") / "disk.npz")
    save_params_npz(path, jax.tree_util.tree_map(np.asarray, params))
    return path


@pytest.fixture(scope="module")
def superpoint_weights(tmp_path_factory):
    from tpu3d.features.learned import save_params_npz
    from tpu3d.features.superpoint import SuperPointNet

    params = SuperPointNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    path = str(tmp_path_factory.mktemp("w") / "superpoint.npz")
    save_params_npz(path, jax.tree_util.tree_map(np.asarray, params))
    return path


@pytest.fixture(scope="module")
def lightglue_weights(tmp_path_factory):
    from tpu3d.features.learned import save_params_npz
    from tpu3d.matching.lightglue import LightGlue

    mod = LightGlue(input_dim=128, n_layers=2)  # reduced depth: wiring test
    k = jnp.zeros((1, 8, 2))
    d = jnp.zeros((1, 8, 128))
    s = jnp.ones((1, 2))
    params = mod.init(jax.random.PRNGKey(0), k, d, s, k, d, s)
    path = str(tmp_path_factory.mktemp("w") / "lightglue.npz")
    save_params_npz(path, jax.tree_util.tree_map(np.asarray, params))
    return path


def _cfg(frontend="classical", fe_weights="", matcher="mnn", m_weights=""):
    return PipelineConfig(
        frontend=FrontendConfig(model=frontend, weights=fe_weights,
                                max_keypoints=128, batch_size=2),
        matching=MatchingConfig(matcher=matcher, weights=m_weights,
                                min_raw_matches=4, pair_batch=4),
    )


@pytest.mark.parametrize("model,wfix", [("disk", "disk_weights"),
                                        ("superpoint", "superpoint_weights")])
def test_learned_extraction_through_pipeline(image_dir, model, wfix, request):
    from tpu3d.sfm.pipeline import run_extraction

    weights = request.getfixturevalue(wfix)
    cfg = _cfg(frontend=model, fe_weights=weights)
    feats = run_extraction(image_dir, cfg, verbose=False)
    assert len(feats.names) == 6
    K = cfg.frontend.max_keypoints
    D = 128 if model == "disk" else 256
    assert feats.keypoints.shape == (6, K, 2)
    assert feats.descriptors.shape == (6, K, D)
    assert feats.colors_bgr.shape == (6, K, 3)
    assert np.all(feats.image_size == [128.0, 96.0])
    # every valid keypoint lies inside the ORIGINAL image (not the 16-pad)
    v = feats.valid
    assert v.any(), "random-weight extractor should still fire somewhere"
    px = feats.keypoints_px
    assert np.all(px[v][:, 0] < 128) and np.all(px[v][:, 1] < 96)
    # descriptors of valid slots are unit-norm; invalid are zeroed
    norms = np.linalg.norm(feats.descriptors, axis=-1)
    np.testing.assert_allclose(norms[v], 1.0, atol=1e-4)
    assert np.all(norms[~v] < 1e-6)
    # centered y-up convention (ref feature_extraction.py:34)
    np.testing.assert_allclose(
        feats.keypoints[v][:, 0], px[v][:, 0] - 64.0, atol=0.51)
    np.testing.assert_allclose(
        feats.keypoints[v][:, 1], -(px[v][:, 1] - 48.0), atol=0.51)


def test_lightglue_matching_through_pipeline(image_dir, disk_weights,
                                             lightglue_weights):
    """Full dispatch: DISK features -> LightGlue gate blocks. Random weights
    mean garbage matches — the assertions target the packed protocol and
    masking invariants, not match quality."""
    from tpu3d.sfm.pipeline import _batch_match_pairs, run_extraction

    cfg = _cfg(frontend="disk", fe_weights=disk_weights,
               matcher="lightglue", m_weights=lightglue_weights)
    feats = run_extraction(image_dir, cfg, verbose=False)
    memo = {}
    _batch_match_pairs(feats, [(0, 1), (1, 2), (2, 3)], cfg,
                       jax.random.PRNGKey(0), memo)
    assert set(memo) == {(0, 1), (1, 2), (2, 3)}
    K = feats.keypoints.shape[1]
    for e, flat in memo.items():
        assert flat.shape == (K * 3 + 2 + 9 + 3,)
        per_kpt = flat[: K * 3].reshape(K, 3)
        mvalid = per_kpt[:, 1] > 0
        idx1 = per_kpt[:, 0].astype(np.int64)
        # matched indices in range; matches only from/to valid keypoints
        assert np.all((idx1 >= 0) & (idx1 < K))
        assert np.all(feats.valid[e[0]][mvalid])
        assert np.all(feats.valid[e[1]][idx1[mvalid]])
        R = flat[K * 3 + 2 : K * 3 + 11].reshape(3, 3)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_lightglue_padding_mask_invariance(rng):
    """Masked LightGlue on padded arrays must agree with the unpadded
    forward on the real slots — the property the pipeline's fixed-shape
    batching relies on."""
    from tpu3d.matching.lightglue import LightGlue, filter_matches

    mod = LightGlue(input_dim=128, n_layers=2)
    M, N, PAD = 40, 48, 24
    kp0 = rng.uniform(0, 128, (1, M, 2)).astype(np.float32)
    kp1 = rng.uniform(0, 128, (1, N, 2)).astype(np.float32)
    d0 = rng.normal(0, 1, (1, M, 128)).astype(np.float32)
    d1 = rng.normal(0, 1, (1, N, 128)).astype(np.float32)
    size = np.array([[128.0, 96.0]], np.float32)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(kp0), jnp.asarray(d0),
                      jnp.asarray(size), jnp.asarray(kp1), jnp.asarray(d1),
                      jnp.asarray(size))
    s_ref = mod.apply(params, jnp.asarray(kp0), jnp.asarray(d0), jnp.asarray(size),
                      jnp.asarray(kp1), jnp.asarray(d1), jnp.asarray(size))
    m0_ref, _, ms0_ref, _ = filter_matches(s_ref)

    def pad(a, n):
        out = np.zeros((1, a.shape[1] + n, *a.shape[2:]), a.dtype)
        out[:, : a.shape[1]] = a
        return jnp.asarray(out)

    v0 = jnp.asarray((np.arange(M + PAD) < M)[None].astype(np.float32))
    v1 = jnp.asarray((np.arange(N + PAD) < N)[None].astype(np.float32))
    s_pad = mod.apply(params, pad(kp0, PAD), pad(d0, PAD), jnp.asarray(size),
                      pad(kp1, PAD), pad(d1, PAD), jnp.asarray(size), v0, v1)
    m0_pad, _, ms0_pad, _ = filter_matches(s_pad)
    m0_pad = np.asarray(m0_pad)[0][:M]
    ms0_pad = np.asarray(ms0_pad)[0][:M]
    np.testing.assert_array_equal(np.asarray(m0_ref)[0], m0_pad)
    np.testing.assert_allclose(np.asarray(ms0_ref)[0], ms0_pad, atol=1e-4)
    # padded slots never decode as matches
    assert np.all(np.asarray(filter_matches(s_pad)[0])[0][M:] == -1)


def test_npz_param_roundtrip(tmp_path):
    from tpu3d.features.learned import load_params_npz, save_params_npz

    tree = {"params": {"a": {"kernel": np.arange(6.0).reshape(2, 3),
                             "bias": np.zeros(3)},
                       "b": {"w": np.ones((4,), np.float32)}}}
    p = str(tmp_path / "p.npz")
    save_params_npz(p, tree)
    back = load_params_npz(p)
    assert set(back["params"]) == {"a", "b"}
    np.testing.assert_array_equal(back["params"]["a"]["kernel"],
                                  tree["params"]["a"]["kernel"])
    np.testing.assert_array_equal(back["params"]["b"]["w"],
                                  tree["params"]["b"]["w"])
