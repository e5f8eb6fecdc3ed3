"""Pallas TPU kernel: scatter-add BACKWARD for packed trilinear sampling.

The dense stage's training step is scatter-bound: the gradient of the
8-corner trilinear gather is an 8-way scatter-add into the voxel grid
(the op torch autograd gives the reference for free through CUDA
grid_sample, sdf.py:297 / plenoxel.py:39), and XLA's scatter on TPU
serializes per update row (~409 ms/batch measured for 393k samples into a
256^3 x 28 grid vs 32 ms for the Pallas forward gather).

Design (conflict-free by construction — no atomics, no RMW races):

  - samples are binned on-device by (x-slab, y-block) of their BASE cell
    with one `lax.sort_key_val` + payload gather; bin offsets come from a
    searchsorted over the sorted keys;
  - the kernel grid is (X, Y/YBS). TPU grid execution is SEQUENTIAL, so
    each instance owns the disjoint output block (1, YBS, Zr+1, 2, 128)
    of the packed-layout gradient (same packing as kernels/trilinear.py)
    and accumulates it in a VMEM scratch buffer with ONE extra y-halo row;
  - a sample with base (x0, y0) touches x-slabs x0 and x0+1: instance x
    processes bin (x0=x) with the (1-fx) weight and bin (x0=x-1) with the
    fx weight, so every contribution lands in the instance that owns its
    output rows. The y0+1 corner row can cross into the next y-block: it
    accumulates in the halo row, which the (sequentially) next instance
    adds to its row 0 through a persistent VMEM carry buffer;
  - entries stream from HBM in CHUNK-sized pieces: scalar fields
    (addresses + lerp fractions) ride FIELD-MAJOR as an (8, Ep) array so
    the lane-dim DMA slices stay 128-aligned (chunk bases round down to
    128), landing in SMEM for scalar reads; gradient rows (pre-tiled to
    the 128-lane packed layout) land in VMEM; the per-entry inner loop
    does one (2, 2, 2, 128) vector read-modify-write of the accumulator.

The public entry is `sample_packed_diff`, a custom_vjp wrapper pairing the
existing box-DMA forward (trilinear.sample_packed) with this backward, so
plenoxel training runs end-to-end on the packed layout. Positions get a
ZERO cotangent (training samples depths with stop_gradient semantics; the
SDF path, which needs d/d pts, keeps the XLA autodiff path).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3d.kernels.trilinear import CPAD, ZROW, _sample_packed

CHUNK = 512        # entries streamed per DMA piece (multiple of 8)


def pick_ybs(Y: int, cap: int = 64) -> int:
    """Largest divisor of Y that is <= cap (y-block rows per instance)."""
    for c in range(min(cap, Y), 0, -1):
        if Y % c == 0:
            return c
    return 1


def _corner_setup_packed(res, min_bound, max_bound, pts):
    """Mirror of trilinear._sample_packed's index/frac computation — must
    stay bit-identical to the forward so the scatter hits the same cells."""
    resa = jnp.asarray(res, pts.dtype)
    u = (pts - min_bound) / (max_bound - min_bound)
    in_bounds = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    v = u * (resa - 1.0)
    i0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, jnp.asarray(res) - 2)
    frac = (v - i0.astype(v.dtype)).astype(jnp.float32)
    return i0, frac, in_bounds


def _scatter_kernel(offs_ref, aux_hbm, g_hbm, out_ref, acc, carry, auxc, gc, sems):
    x = pl.program_id(0)
    yb = pl.program_id(1)
    NB = pl.num_programs(1)
    YBS = acc.shape[0] - 1

    acc[...] = jnp.zeros(acc.shape, acc.dtype)

    # packed z-position of lane l, sublane s, z-row r: z = r*8 + s*4 + l//32
    zloc = (jax.lax.broadcasted_iota(jnp.int32, (2, 2, 128), 0) * ZROW
            + jax.lax.broadcasted_iota(jnp.int32, (2, 2, 128), 1) * 4
            + jax.lax.broadcasted_iota(jnp.int32, (2, 2, 128), 2) // 32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def process(b, side):
        """Accumulate bin b's entries; side 0 = own slab (weight 1-fx),
        side 1 = entries whose base is the previous slab (weight fx)."""
        start = offs_ref[0, b]
        end = offs_ref[0, b + 1]
        # chunk bases 128-aligned: aux rides as (8, Ep) so its lane-dim
        # DMA slices must align to the (., 128) HBM tiling
        base = (start // 128) * 128
        nch = (end - base + CHUNK - 1) // CHUNK

        def chunk_body(c, _):
            ebase = base + c * CHUNK
            da = pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(ebase, CHUNK)], auxc, sems.at[0])
            dg = pltpu.make_async_copy(
                g_hbm.at[pl.ds(ebase // 8, CHUNK // 8)], gc, sems.at[1])
            da.start()
            dg.start()
            da.wait()
            dg.wait()
            lo = jnp.maximum(start - ebase, 0)
            hi = jnp.minimum(end - ebase, CHUNK)

            def entry(j, _):
                k8 = j // 8
                kr = j - k8 * 8
                y0l = auxc[0, j].astype(jnp.int32)
                zr = auxc[1, j].astype(jnp.int32)
                zrem = auxc[2, j].astype(jnp.int32)
                fx = auxc[3, j]
                fy = auxc[4, j]
                fz = auxc[5, j]
                wx = (1.0 - fx) if side == 0 else fx
                # select sublane kr of the gradient-row block -> (128,)
                grow = jnp.sum(
                    gc[k8] * (sub_iota == kr).astype(jnp.float32), axis=0)
                wz = (jnp.where(zloc == zrem, 1.0 - fz, 0.0)
                      + jnp.where(zloc == zrem + 1, fz, 0.0))
                contrib = wz * grow[None, None, :]              # (2, 2, 128)
                tile = jnp.concatenate([
                    (wx * (1.0 - fy) * contrib)[None],
                    (wx * fy * contrib)[None],
                ])                                               # (2, 2, 2, 128)
                cur = acc[pl.ds(y0l, 2), pl.ds(zr, 2)]
                acc[pl.ds(y0l, 2), pl.ds(zr, 2)] = cur + tile
                return 0

            jax.lax.fori_loop(lo, hi, entry, 0)
            return 0

        jax.lax.fori_loop(0, nch, chunk_body, 0)

    process(x * NB + yb, 0)

    @pl.when(x > 0)
    def _():
        process((x - 1) * NB + yb, 1)

    # halo row carried from the previous y-block of the SAME slab (grid
    # order is x-major, yb innermost; the last block's halo is always zero
    # because base y0 <= Y-2, so no cross-slab contamination).
    @pl.when(yb > 0)
    def _():
        acc[0] = acc[0] + carry[...]

    out_ref[0] = acc[:YBS]
    carry[...] = acc[YBS]


@functools.partial(jax.jit, static_argnames=("res", "interpret"))
def scatter_grad(g_vals: jnp.ndarray, min_bound, max_bound, res,
                 pts: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Gradient w.r.t. the PACKED grid of `sum(g_vals * sample_packed(...))`.

    g_vals: (N, CPAD) cotangent of the sampled values; pts: (N, 3).
    Returns (X, Y, Z//8+1, 2, 128) float32 matching pack_grid's layout.
    """
    X, Y, Z = res
    Zr = Z // ZROW
    YBS = pick_ybs(Y)
    NB = Y // YBS
    N = pts.shape[0]

    i0, frac, in_b = _corner_setup_packed(res, min_bound, max_bound, pts)
    zr = i0[:, 2] // ZROW
    zrem = i0[:, 2] - zr * ZROW
    yb = i0[:, 1] // YBS
    y0l = i0[:, 1] - yb * YBS
    key = i0[:, 0] * NB + yb

    g = g_vals.astype(jnp.float32) * in_b[:, None]
    aux = jnp.stack([
        y0l.astype(jnp.float32), zr.astype(jnp.float32),
        zrem.astype(jnp.float32), frac[:, 0], frac[:, 1], frac[:, 2],
        jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
    ], axis=-1)

    ks, order = jax.lax.sort_key_val(key, jnp.arange(N, dtype=jnp.int32))
    payload = jnp.concatenate([aux, g], axis=-1)          # (N, 8 + CPAD)
    ps = jnp.take(payload, order, axis=0)

    nbins = X * NB
    offs = jnp.searchsorted(ks, jnp.arange(nbins + 1, dtype=jnp.int32),
                            side="left").astype(jnp.int32)[None, :]

    Ep = (N // CHUNK + 2) * CHUNK
    ps = jnp.pad(ps, ((0, Ep - N), (0, 0)))
    auxT = ps[:, :8].T                                    # (8, Ep) field-major
    g128 = jnp.tile(ps[:, 8:], (1, 128 // CPAD)).reshape(Ep // 8, 8, 128)

    return pl.pallas_call(
        _scatter_kernel,
        grid=(X, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, YBS, Zr + 1, 2, 128),
                               lambda x, yb: (x, yb, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Zr + 1, 2, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((YBS + 1, Zr + 1, 2, 128), jnp.float32),
            pltpu.VMEM((Zr + 1, 2, 128), jnp.float32),
            pltpu.SMEM((8, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK // 8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(offs, auxT, g128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def sample_packed_diff(res, interpret, packed, min_bound, max_bound,
                       pts) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable (w.r.t. the packed grid) Pallas trilinear sampling.

    res: static (X, Y, Z); interpret: static bool (True on CPU backends).
    Returns (values (N, CPAD), in_bounds (N,)). The cotangent for `pts`
    is ZERO — callers must not rely on position gradients (plenoxel
    training samples depths under stop_gradient; sdf.py-style spatial
    gradients keep the XLA path)."""
    return _sample_packed(packed, min_bound, max_bound, res, pts, interpret)


def _spd_fwd(res, interpret, packed, min_bound, max_bound, pts):
    out = _sample_packed(packed, min_bound, max_bound, res, pts, interpret)
    return out, (min_bound, max_bound, pts)


def _spd_bwd(res, interpret, resid, ct):
    min_bound, max_bound, pts = resid
    g_vals, _ = ct  # in_bounds is boolean -> float0 cotangent, ignored
    gp = scatter_grad(g_vals, min_bound, max_bound, res, pts, interpret)
    return (gp, jnp.zeros_like(min_bound), jnp.zeros_like(max_bound),
            jnp.zeros_like(pts))


sample_packed_diff.defvjp(_spd_fwd, _spd_bwd)
