"""Pallas TPU kernel: trilinear voxel-grid sampling via box DMA.

XLA's row-gather on TPU runs latency-bound at ~2.5 GB/s for the dense
stage's access pattern (393k samples x 8 corners x 28 channels from a
1.9 GB grid — measured in benchmarks/gather_probe*.py), which makes the
voxel gather the dominant cost of plenoxel training/rendering (ref
plenoxel.py:39 / sdf.py:297 delegate this to torch CUDA grid_sample).

Design:
  - the grid is re-packed once to (X, Y, Zr, 2, 128): one "row" holds
    8 consecutive z-cells x 32 channels (28 padded to 32) = two (2, 128)
    sublane/lane tiles = 1 KB, so every row is tile-aligned and the two
    trailing dims are always copied whole (no alignment constraints on
    the dynamic leading indices);
  - per sample, ONE strided box DMA grid[x0:x0+2, y0:y0+2, zr:zr+2]
    fetches a (2, 2, 2, 2, 128) = 4 KB block that contains all 8
    trilinear corners for any in-cell position (16 consecutive z-cells
    straddle-free);
  - a block of BLK samples issues all its DMAs back-to-back (BLK-deep
    outstanding queue hides HBM latency), then the interpolation runs
    vectorized on the VPU: the z-lerp is an iota-mask contraction over
    the 16 fetched z-cells (built from per-sample (z_rem, fz)), the
    lane fold 128->32 is four static lane slices, and the xy-lerp is
    four fused multiply-adds.

Forward only; the training backward currently uses XLA's scatter via
custom_vjp (see trilinear_sample_packed).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128          # samples per grid instance
ZROW = 8           # z-cells per packed row
CPAD = 32          # padded channel count (28 -> 32)


def pack_grid(grid: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z, C<=32) -> (X, Y, Zr + 1, 2, 128) with one padding row so
    the per-sample box DMA (zr, zr+1) never runs off the end."""
    X, Y, Z, C = grid.shape
    assert C <= CPAD
    assert Z % ZROW == 0, "Z must be a multiple of 8"
    g = jnp.pad(grid, ((0, 0), (0, 0), (0, ZROW), (0, CPAD - C)))
    # (X, Y, Z + 8, 32) -> rows of 8 z-cells: (X, Y, Zr+1, 8, 32)
    g = g.reshape(X, Y, Z // ZROW + 1, ZROW, CPAD)
    # fold (8, 32) into (2 sublanes, 128 lanes): z-cell q of sublane s is
    # lane block q*32..q*32+31 with z = s*4 + q
    return g.reshape(X, Y, Z // ZROW + 1, 2, 4 * CPAD)


def unpack_grid(packed: jnp.ndarray, shape) -> jnp.ndarray:
    """Inverse of pack_grid: (X, Y, Zr+1, 2, 128) -> (X, Y, Z, C).
    pack_grid is a linear injective reshape+pad, so this also maps a
    packed-layout GRADIENT back to the unpacked grid's gradient."""
    X, Y, Z, C = shape
    g = packed.reshape(X, Y, (Z // ZROW + 1) * ZROW, CPAD)
    return g[:, :, :Z, :C]


def sample_packed(packed: jnp.ndarray, min_bound, max_bound, res,
                  pts: jnp.ndarray, interpret=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear samples from a pack_grid()-packed grid.

    pts: (N, 3) world points. Returns (values (N, CPAD), in_bounds (N,)).
    Matches dense.grid.trilinear_sample (align_corners, clipped-base
    frac, OOB zeroing) — tests assert exact agreement. On the CPU backend
    the kernel runs in interpret mode automatically."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _sample_packed(packed, min_bound, max_bound, res, pts, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_packed(packed: jnp.ndarray, min_bound, max_bound, res,
                   pts: jnp.ndarray, interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = pts.shape[0]
    nb = -(-N // BLK)
    Np = nb * BLK
    resa = jnp.asarray(res, pts.dtype)
    u = (pts - min_bound) / (max_bound - min_bound)
    in_bounds = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    v = u * (resa - 1.0)
    i0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, jnp.asarray(res) - 2)
    frac = (v - i0.astype(v.dtype)).astype(jnp.float32)

    zr = i0[:, 2] // ZROW
    zrem = (i0[:, 2] - zr * ZROW).astype(jnp.float32)

    def padN(a, fill=0):
        return jnp.concatenate([a, jnp.full((Np - N, *a.shape[1:]), fill, a.dtype)])

    xyz = jnp.stack([padN(i0[:, 0]), padN(i0[:, 1]), padN(zr)]).astype(jnp.int32)  # (3, Np)
    aux = jnp.stack([
        padN(frac[:, 0]), padN(frac[:, 1]), padN(frac[:, 2]), padN(zrem),
        padN(in_bounds.astype(jnp.float32)),
        jnp.zeros(Np, jnp.float32), jnp.zeros(Np, jnp.float32), jnp.zeros(Np, jnp.float32),
    ], axis=-1).reshape(nb, BLK, 8)

    # xyz rides in SMEM as a per-block (3, BLK) window — prefetching the
    # whole (3, Np) array would blow the 1 MB SMEM budget at real sizes.
    out = pl.pallas_call(
        _kernel_whole,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, BLK), lambda b: (0, b), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK, 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # packed grid stays in HBM
        ],
        out_specs=pl.BlockSpec((1, BLK, CPAD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, BLK, CPAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLK, 2, 2, 2, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((BLK,)),
        ],
        interpret=interpret,
    )(xyz, aux, packed)
    return out.reshape(Np, CPAD)[:N], in_bounds


def _kernel_whole(xyz_ref, aux_ref, ghbm, out_ref, scratch, sems):
    """xyz_ref: SMEM (3, BLK) window for this block."""

    def issue(k, _):
        x0 = xyz_ref[0, k]
        y0 = xyz_ref[1, k]
        zr = xyz_ref[2, k]
        pltpu.make_async_copy(
            ghbm.at[pl.ds(x0, 2), pl.ds(y0, 2), pl.ds(zr, 2)],
            scratch.at[k],
            sems.at[k],
        ).start()
        return 0

    jax.lax.fori_loop(0, BLK, issue, 0)

    def wait(k, _):
        pltpu.make_async_copy(
            ghbm.at[pl.ds(0, 2), pl.ds(0, 2), pl.ds(0, 2)],
            scratch.at[k],
            sems.at[k],
        ).wait()
        return 0

    jax.lax.fori_loop(0, BLK, wait, 0)

    fx = aux_ref[0, :, 0][:, None]
    fy = aux_ref[0, :, 1][:, None]
    fz = aux_ref[0, :, 2][:, None]
    zrem = aux_ref[0, :, 3][:, None].astype(jnp.int32)

    lane_q = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1) // 32

    v = scratch[:]
    acc = jnp.zeros((BLK, 2, 2, 128), jnp.float32)
    for zrsel in range(2):
        for sub in range(2):
            zloc = zrsel * 8 + sub * 4 + lane_q
            w = (jnp.where(zloc == zrem, 1.0 - fz, 0.0)
                 + jnp.where(zloc == zrem + 1, fz, 0.0))
            acc = acc + v[:, :, :, zrsel, sub, :] * w[:, None, None, :]

    t = (acc[..., 0:32] + acc[..., 32:64] + acc[..., 64:96] + acc[..., 96:128])

    out = ((1.0 - fx) * (1.0 - fy) * t[:, 0, 0]
           + (1.0 - fx) * fy * t[:, 0, 1]
           + fx * (1.0 - fy) * t[:, 1, 0]
           + fx * fy * t[:, 1, 1])
    valid = aux_ref[0, :, 4][:, None]
    out_ref[0] = out * valid
