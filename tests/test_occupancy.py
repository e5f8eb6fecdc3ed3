import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3d.dense.grid import VoxelGrid, create_grid
from tpu3d.dense.occupancy import (
    occupancy_from_grid,
    occupancy_from_packed,
    tighten_bands,
)
from tpu3d.dense.render import render_rays


def make_blob_grid(res=32, channels=28):
    """Grid with density only inside a small central blob."""
    vg = create_grid(res, (-1, -1, -1), (1, 1, 1), channels=channels, init=0.0)
    g = np.zeros(vg.grid.shape, np.float32)
    c = res // 2
    g[c - 3 : c + 3, c - 3 : c + 3, c - 3 : c + 3, 0] = 5.0
    g[..., 1:] = 0.3
    return VoxelGrid(jnp.asarray(g), vg.min_bound, vg.max_bound)


def test_occupancy_from_grid_blocks():
    vg = make_blob_grid(res=32)
    occ = np.asarray(occupancy_from_grid(vg.grid, factor=4, threshold=1e-2, dilate=False))
    assert occ.shape == (8, 8, 8)
    # Blob spans voxels 13..18 -> cells 3 and 4 on each axis.
    expect = np.zeros((8, 8, 8), bool)
    expect[3:5, 3:5, 3:5] = True
    np.testing.assert_array_equal(occ, expect)
    # Dilation grows by one cell in the 6-neighborhood.
    occ_d = np.asarray(occupancy_from_grid(vg.grid, factor=4, threshold=1e-2))
    assert occ_d[2, 3, 3] and occ_d[5, 4, 4] and not occ_d[2, 2, 2]


def test_occupancy_from_packed_matches():
    from tpu3d.kernels.trilinear import pack_grid

    vg = make_blob_grid(res=32)
    occ_g = np.asarray(occupancy_from_grid(vg.grid, 4, 1e-2))
    occ_p = np.asarray(occupancy_from_packed(pack_grid(vg.grid), vg.grid.shape, 4, 1e-2))
    np.testing.assert_array_equal(occ_g, occ_p)


def test_tighten_bands_brackets_blob():
    vg = make_blob_grid(res=32)
    occ = occupancy_from_grid(vg.grid, 4, 1e-2)
    # Ray through the center: band must shrink and still bracket the blob
    # (|x| <= 6/16 plus one-cell dilation and one-probe margin).
    ro = jnp.asarray([[-3.0, 0.0, 0.0], [-3.0, 0.9, 0.9]])
    rd = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    t_near = jnp.asarray([0.0, 0.0])
    t_far = jnp.asarray([6.0, 6.0])
    t0, t1, hit = tighten_bands(occ, vg.min_bound, vg.max_bound, ro, rd, t_near, t_far)
    t0, t1, hit = np.asarray(t0), np.asarray(t1), np.asarray(hit)
    assert hit[0] and not hit[1]
    # Blob spans t in [3 - 6/16, 3 + 6/16]; the tightened band must cover
    # it with margin (dilation adds a cell, the probe comb one step).
    blob_in, blob_out = 3.0 - 6 / 16, 3.0 + 6 / 16
    assert t0[0] < blob_in and t1[0] > blob_out
    assert (t1[0] - t0[0]) < 2.0  # actually tightened (from 6.0)
    assert t1[1] - t0[1] < 1e-3   # miss -> degenerate band


def test_render_rays_occ_pruned_matches_unpruned():
    vg = make_blob_grid(res=32)
    occ = occupancy_from_grid(vg.grid, 4, 1e-2)
    rng = np.random.default_rng(0)
    n = 128
    ro = rng.normal(0, 1, (n, 3)).astype(np.float32)
    ro = 3.0 * ro / np.linalg.norm(ro, axis=1, keepdims=True)
    rd = (-ro / np.linalg.norm(ro, axis=1, keepdims=True)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    img_a = np.asarray(render_rays(vg, key, jnp.asarray(ro), jnp.asarray(rd),
                                   1.0, 5.0, 256, perturb=False))
    img_b = np.asarray(render_rays(vg, key, jnp.asarray(ro), jnp.asarray(rd),
                                   1.0, 5.0, 256, perturb=False, occ=occ))
    # Same scene, samples concentrated in the occupied band: near-identical
    # pixels (discretization differences only).
    assert np.max(np.abs(img_a - img_b)) < 0.02


def test_train_step_occ_runs():
    from tpu3d.config import DenseConfig
    from tpu3d.dense.train import RayDataset, train_plenoxel

    rng = np.random.default_rng(0)
    n = 512
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    ds = RayDataset(o, d, rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cfg = DenseConfig(grid_resolution=16, num_samples=32, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=128, epochs=2,
                      occupancy_prune=True, occupancy_every=3,
                      occupancy_factor=4, occupancy_probes=32)
    grid, losses = train_plenoxel(ds, cfg, verbose=False, packed=False)
    assert np.all(np.isfinite(np.asarray(grid.grid)))
    assert np.isfinite(losses[-1])
