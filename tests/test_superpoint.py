"""Parity test: Flax SuperPoint vs the torch reference implementation as a
numerical oracle (random weights, converted params — same methodology as
tests/test_lightglue.py)."""
import os

import numpy as np
import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "lightglue")), reason="reference not mounted")
def test_superpoint_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys
    import types

    # superpoint.py does `from .utils import ImagePreprocessor` (only used
    # by its extract() convenience wrapper) and utils pulls in kornia,
    # which isn't installed — stub the package context.
    pkg = types.ModuleType("refpkg")
    pkg.__path__ = [os.path.join(REF, "lightglue")]
    utils_stub = types.ModuleType("refpkg.utils")
    class _FakePreproc:
        default_conf = {}

    utils_stub.ImagePreprocessor = _FakePreproc
    sys.modules["refpkg"] = pkg
    sys.modules["refpkg.utils"] = utils_stub
    spec = importlib.util.spec_from_file_location(
        "refpkg.superpoint", os.path.join(REF, "lightglue", "superpoint.py")
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    import jax.numpy as jnp
    from tpu3d.features.superpoint import (
        SuperPointFeatures, convert_torch_state_dict, extract_superpoint,
    )

    torch.manual_seed(0)
    # The reference downloads its checkpoint unconditionally; keep random
    # init (zero egress) — load_state_dict of the model's own random state
    # is an identity.
    orig = torch.hub.load_state_dict_from_url
    captured = {}

    def fake_load(url, **kw):
        return {}

    torch.hub.load_state_dict_from_url = fake_load
    try:
        class _NoLoad(ref_mod.SuperPoint):
            def load_state_dict(self, sd, **kw):
                return  # keep the random init

        tm = _NoLoad(max_num_keypoints=64, detection_threshold=0.0).eval()
    finally:
        torch.hub.load_state_dict_from_url = orig

    img = rng.uniform(0, 1, (1, 64, 96)).astype(np.float32)
    with torch.no_grad():
        out = tm({"image": torch.tensor(img)[:, None]})
    kp_ref = out["keypoints"].numpy()[0]
    sc_ref = out["keypoint_scores"].numpy()[0]
    d_ref = out["descriptors"].numpy()[0]

    params = convert_torch_state_dict(tm.state_dict())
    feats = extract_superpoint(params, jnp.asarray(img), max_keypoints=64,
                               detection_threshold=0.0)
    kp = np.asarray(feats.keypoints[0])
    sc = np.asarray(feats.scores[0])
    d = np.asarray(feats.descriptors[0])

    # same keypoint set (order may differ among equal scores -> sort both)
    def key(k, s):
        o = np.lexsort((k[:, 0], k[:, 1]))
        return k[o], s[o], o

    n = min(len(kp_ref), int(np.asarray(feats.valid[0]).sum()))
    # compare the top-n by score from both
    o_ref = np.argsort(-sc_ref)[:n]
    o_our = np.argsort(-sc)[:n]
    k1, s1, _ = key(kp_ref[o_ref], sc_ref[o_ref])
    k2, s2, perm2 = key(kp[o_our], sc[o_our])
    np.testing.assert_allclose(k1, k2, atol=0)
    np.testing.assert_allclose(s1, s2, atol=1e-4)

    # descriptors at identical keypoints agree
    d2 = d[o_our][perm2]
    # find matching ref descriptor rows via the sorted order
    d1 = d_ref[o_ref][np.lexsort((kp_ref[o_ref][:, 0], kp_ref[o_ref][:, 1]))]
    np.testing.assert_allclose(d1, d2, atol=2e-3)
