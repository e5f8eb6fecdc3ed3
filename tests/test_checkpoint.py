"""Dense-training checkpoint/resume + artifact store roundtrips."""
import numpy as np
import jax.numpy as jnp

from tpu3d.config import DenseConfig
from tpu3d.dense.train import RayDataset, train_plenoxel
from tpu3d.io.artifacts import ArtifactStore


def tiny_dataset(rng, n=512):
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return RayDataset(o, d, rgb)


def test_artifact_store_roundtrip(tmp_path, rng):
    store = ArtifactStore(str(tmp_path))
    a = rng.normal(0, 1, (16, 3)).astype(np.float32)
    store.save("thing", a=a, b=np.arange(5))
    out = store.load("thing")
    np.testing.assert_array_equal(out["a"], a)
    assert store.load("missing") is None
    store.save_json("meta", {"x": 1})
    assert store.load_json("meta") == {"x": 1}


def test_dense_checkpoint_resume(tmp_path, rng):
    cfg = DenseConfig(grid_resolution=8, num_samples=16, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=128, epochs=2,
                      learning_rate=1e-2)
    ds = tiny_dataset(rng)
    store = ArtifactStore(str(tmp_path))

    # full 2-epoch run
    grid_full, losses_full = train_plenoxel(ds, cfg, verbose=False, log_every=2)

    # 1 epoch + checkpoint, then resume for epoch 2
    cfg1 = DenseConfig(**{**cfg.__dict__, "epochs": 1})
    g1, l1 = train_plenoxel(ds, cfg1, verbose=False, log_every=2, checkpoint_store=store)
    assert store.has("dense_ckpt")
    cfg2 = DenseConfig(**{**cfg.__dict__, "epochs": 2})
    g2, l2 = train_plenoxel(ds, cfg2, verbose=False, log_every=2,
                            checkpoint_store=store, resume=True)
    # resumed run continued from epoch 1 (loss history grew, grid changed)
    assert len(l2) > len(l1)
    assert not np.allclose(np.asarray(g2.grid), np.asarray(g1.grid))
    # resumed final loss should be in the same ballpark as the full run
    assert abs(l2[-1] - losses_full[-1]) < 0.1
