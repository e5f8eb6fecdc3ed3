"""Parity test: our Flax LightGlue vs the torch reference implementation
(used purely as a numerical ORACLE — the reference package at
/root/reference/lightglue is imported read-only with randomly initialized
weights, converted through convert_torch_state_dict, and both forwards must
agree). This validates that converted *released* checkpoints will be
numerically interchangeable."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "lightglue")), reason="reference not mounted")
@pytest.mark.parametrize("n_layers", [2, 9])
def test_lightglue_matches_torch_reference(rng, n_layers):
    torch = pytest.importorskip("torch")
    # Load the reference module file directly (the package __init__ pulls in
    # kornia, which is not installed; lightglue.py itself is torch-only).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_lightglue", os.path.join(REF, "lightglue", "lightglue.py")
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    TorchLG = ref_mod.LightGlue

    import jax.numpy as jnp
    from tpu3d.matching.lightglue import LightGlue as JaxLG, convert_torch_state_dict, filter_matches

    torch.manual_seed(0)
    # 2 layers exercise self+cross+assignment cheaply; 9 layers is the full
    # released-checkpoint depth (the default LightGlue config).
    tm = TorchLG(
        features=None, input_dim=128, n_layers=n_layers, flash=False,
        depth_confidence=-1, width_confidence=-1, weights=None,
    ).eval()

    B, M, N = 1, 64, 80
    kpts0 = np.stack([rng.uniform(0, 640, (B, M)), rng.uniform(0, 480, (B, M))], -1).astype(np.float32)
    kpts1 = np.stack([rng.uniform(0, 640, (B, N)), rng.uniform(0, 480, (B, N))], -1).astype(np.float32)
    d0 = rng.normal(0, 1, (B, M, 128)).astype(np.float32)
    d1 = rng.normal(0, 1, (B, N, 128)).astype(np.float32)
    size0 = np.array([[640.0, 480.0]], np.float32)
    size1 = np.array([[640.0, 480.0]], np.float32)

    with torch.no_grad():
        out = tm({
            "image0": {"keypoints": torch.tensor(kpts0), "descriptors": torch.tensor(d0),
                        "image_size": torch.tensor(size0)},
            "image1": {"keypoints": torch.tensor(kpts1), "descriptors": torch.tensor(d1),
                        "image_size": torch.tensor(size1)},
        })
    m0_ref = out["matches0"].numpy()
    ms0_ref = out["matching_scores0"].numpy()

    params = convert_torch_state_dict(tm.state_dict(), n_layers=n_layers)
    jm = JaxLG(input_dim=128, n_layers=n_layers)
    scores = np.asarray(
        jm.apply(params, jnp.asarray(kpts0), jnp.asarray(d0), jnp.asarray(size0),
                 jnp.asarray(kpts1), jnp.asarray(d1), jnp.asarray(size1))
    )
    assert scores.shape == (B, M + 1, N + 1)
    assert np.all(np.isfinite(scores))

    # Decoded matches must agree with the torch outputs exactly, and match
    # confidences to float tolerance.
    m0, m1, ms0, ms1 = filter_matches(jnp.asarray(scores), threshold=0.1)
    np.testing.assert_array_equal(np.asarray(m0)[0], m0_ref[0])
    np.testing.assert_allclose(np.asarray(ms0)[0], ms0_ref[0], atol=1e-3)
