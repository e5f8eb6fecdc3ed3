"""Structural tests for the Flax DISK implementation (no pretrained
weights are downloadable in this environment; numerical parity vs kornia
is validated by convert_kornia_state_dict wherever a checkpoint exists)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu3d.features.disk import DiskUNet, extract_disk, detect_from_heatmap


def test_unet_shapes(rng):
    net = DiskUNet()
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 64, 64, 129)
    assert np.all(np.isfinite(np.asarray(out)))


def test_extract_disk_random_weights(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = DiskUNet().init(jax.random.PRNGKey(0), x)
    feats = extract_disk(params, x, max_keypoints=128)
    assert feats.keypoints.shape == (1, 128, 2)
    assert feats.descriptors.shape == (1, 128, 128)
    d = np.asarray(feats.descriptors[0])[np.asarray(feats.valid[0])]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)


def test_detect_from_heatmap_nms(rng):
    heat = np.full((1, 32, 32), -1.0, np.float32)
    heat[0, 8, 8] = 5.0
    heat[0, 8, 9] = 4.0   # suppressed by the 5-window NMS
    heat[0, 20, 20] = 3.0
    desc = rng.normal(0, 1, (1, 32, 32, 128)).astype(np.float32)
    feats = detect_from_heatmap(jnp.asarray(heat), jnp.asarray(desc), max_keypoints=8, threshold=0.0)
    kp = np.asarray(feats.keypoints[0])[np.asarray(feats.valid[0])]
    got = {tuple(k) for k in kp.astype(int)}
    assert (8, 8) in got and (20, 20) in got
    assert (9, 8) not in got
