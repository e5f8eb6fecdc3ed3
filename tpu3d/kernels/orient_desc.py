"""Fused Pallas TPU kernel: dominant orientation + descriptor sampling in
ONE grid instance per keypoint.

The split pipeline paid, per keypoint, TWO kernel dispch instances (one for
the 11x11 orientation samples, one for the 16x16 descriptor grid) and TWO
patch DMAs of the same neighborhood — per-instance fixed cost dominates the
descriptor stage. Here one instance:

  1. DMAs the (gx, gy) patch once (double-buffered across instances);
  2. samples the 11x11 orientation grid (axis-aligned, spacing 0.9 sigma)
     via the bilinear-weights-as-matmul trick;
  3. builds the 36-bin gaussian-weighted orientation histogram IN-KERNEL
     (one-hot matmul), circular-smooths it twice with a constant circulant
     matrix, finds the parabolic-interpolated peak -> theta;
  4. rotates the 16x16 descriptor grid by theta, samples it, and writes
     the (2, 256) gradient samples + theta.

The 4x4x8 descriptor binning stays in jnp where it is matmul-shaped over
the whole keypoint batch. Semantics mirror
features/descriptor.py::keypoint_orientations + sift_descriptors (the
non-TPU reference path) including the per-keypoint octave-border clamps.

PATCH_Y is 96 here (vs 64 in patch_sample.py): the rotated descriptor
cloud of a max-sigma keypoint spans ~58 px plus the 8-row base-alignment
rounding, which the 64-row window silently saturated at the patch edge.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_Y = 96
PATCH_X = 256
ORI_N = 121       # 11x11 orientation samples (padded to 128 lanes)
ORI_PAD = 128
DESC_N = 256      # 16x16 descriptor samples
HIST = 36         # orientation histogram bins (padded to 128 lanes)


def _atan2_poly(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 via a degree-9 odd minimax polynomial (|err| < 1e-5 rad) —
    Pallas TPU has no atan2 lowering, and orientation binning only needs
    ~1e-3 rad (bins are 10 degrees wide with linear interpolation)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    z2 = z * z
    a = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410
             + z2 * (-0.0851330 + z2 * 0.0208351))))
    a = jnp.where(ay > ax, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


def _bilinear_weights(pos: jnp.ndarray, width: int, n: int) -> jnp.ndarray:
    """(n,) in-patch positions -> (n, width) one-hot-pair weights."""
    p0 = jnp.floor(pos)
    f = pos - p0
    p0i = p0.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    w0 = jnp.where(iota == p0i[:, None], 1.0 - f[:, None], 0.0)
    w1 = jnp.where(iota == p0i[:, None] + 1, f[:, None], 0.0)
    return w0 + w1


def _sample(patch_gx, patch_gy, ys, xs, n):
    """Bilinear samples of both gradient planes at in-patch (ys, xs)."""
    wr = _bilinear_weights(jnp.clip(ys, 0.0, PATCH_Y - 2.0), PATCH_Y, n)
    wc = _bilinear_weights(jnp.clip(xs, 0.0, PATCH_X - 2.0), PATCH_X, n)
    rgx = jnp.dot(wr, patch_gx, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    rgy = jnp.dot(wr, patch_gy, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(rgx * wc, axis=1), jnp.sum(rgy * wc, axis=1)


def _ori_grid():
    """Constant 11x11 offsets + gaussian weights, padded to 128.
    NUMPY on purpose: module-level jnp arrays initialize the XLA backend at
    import time, which breaks jax.distributed.initialize (ROUND2_NOTES)."""
    i = np.arange(ORI_PAD)
    dy = np.where(i < ORI_N, i // 11 - 5, 0).astype(np.float32)
    dx = np.where(i < ORI_N, i % 11 - 5, 0).astype(np.float32)
    wgt = np.exp(-(dy**2 + dx**2) / (2 * (1.5 * 5 / 3.0) ** 2)).astype(np.float32)
    wgt[ORI_N:] = 0.0
    return dy, dx, wgt


def _kernel(lyx0_ref, par_ref, ys_o_ref, xs_o_ref, gx_hbm, gy_hbm,
            out_ref, patch, sem):
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    slot = jax.lax.rem(k, 2)

    def _copies(idx, sl):
        lvl = lyx0_ref[0, idx]
        y0 = pl.multiple_of(lyx0_ref[1, idx], 8)
        x0 = pl.multiple_of(lyx0_ref[2, idx], 128)
        cp = pltpu.make_async_copy(
            gx_hbm.at[lvl, pl.ds(y0, PATCH_Y), pl.ds(x0, PATCH_X)],
            patch.at[sl, 0], sem.at[sl, 0])
        cp2 = pltpu.make_async_copy(
            gy_hbm.at[lvl, pl.ds(y0, PATCH_Y), pl.ds(x0, PATCH_X)],
            patch.at[sl, 1], sem.at[sl, 1])
        return cp, cp2

    @pl.when(k == 0)
    def _():
        a, b = _copies(0, 0)
        a.start()
        b.start()

    @pl.when(k + 1 < nk)
    def _():
        a, b = _copies(k + 1, 1 - slot)
        a.start()
        b.start()

    y0f = lyx0_ref[1, k].astype(jnp.float32)
    x0f = lyx0_ref[2, k].astype(jnp.float32)
    ky = par_ref[0, 0, 0]
    kx = par_ref[0, 0, 1]
    sigma = par_ref[0, 0, 2]
    ymax = par_ref[0, 0, 3]
    xmax = par_ref[0, 0, 4]

    # Orientation sample coords (precomputed in jnp: clamp semantics shared
    # with the reference path), shifted into the patch frame.
    ys_o = ys_o_ref[0, 0, :] - y0f
    xs_o = xs_o_ref[0, 0, :] - x0f

    cp, cp2 = _copies(k, slot)
    cp.wait()
    cp2.wait()
    pgx = patch[slot, 0]
    pgy = patch[slot, 1]

    gxs, gys = _sample(pgx, pgy, ys_o, xs_o, ORI_PAD)
    # Constants rebuilt from iota IN-KERNEL (pallas_call rejects captured
    # arrays): 11x11 gaussian weights, then the 36-bin histogram one-hots
    # and the squared circular-smoothing circulant (3-tap mean twice ==
    # circulant with coefficients [1,2,3,2,1]/9).
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (1, ORI_PAD), 1)[0]
    dyg_o = jnp.where(lane_o < ORI_N, lane_o // 11 - 5, 0).astype(jnp.float32)
    dxg_o = jnp.where(lane_o < ORI_N, lane_o % 11 - 5, 0).astype(jnp.float32)
    wgt = jnp.where(
        lane_o < ORI_N,
        jnp.exp(-(dyg_o * dyg_o + dxg_o * dxg_o) / (2 * (1.5 * 5 / 3.0) ** 2)),
        0.0)
    mag = jnp.sqrt(gxs * gxs + gys * gys) * wgt
    ang = _atan2_poly(gys, gxs)
    binf = (ang / (2 * jnp.pi) + 0.5) * HIST
    b0 = jnp.floor(binf).astype(jnp.int32) % HIST
    frac = binf - jnp.floor(binf)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (ORI_PAD, ORI_PAD), 1)
    oh0 = jnp.where(iota_b == b0[:, None], 1.0, 0.0)
    oh1 = jnp.where(iota_b == ((b0 + 1) % HIST)[:, None], 1.0, 0.0)
    hist = (jnp.dot((mag * (1.0 - frac))[None, :], oh0,
                    preferred_element_type=jnp.float32)
            + jnp.dot((mag * frac)[None, :], oh1,
                      preferred_element_type=jnp.float32))  # (1, 128)
    ii = jax.lax.broadcasted_iota(jnp.int32, (ORI_PAD, ORI_PAD), 0)
    dm = jax.lax.rem(iota_b - ii + 2 * HIST, HIST)
    sm = (jnp.where(dm == 0, 3.0 / 9.0, 0.0)
          + jnp.where((dm == 1) | (dm == HIST - 1), 2.0 / 9.0, 0.0)
          + jnp.where((dm == 2) | (dm == HIST - 2), 1.0 / 9.0, 0.0))
    sm = jnp.where((ii < HIST) & (iota_b < HIST), sm, 0.0)
    hist = jnp.dot(hist, sm, preferred_element_type=jnp.float32)  # (1, 128)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ORI_PAD), 1)
    live = lane < HIST
    # First-max via min-lane reduction (argmax has no TC lowering either).
    mx = jnp.max(jnp.where(live, hist, -1.0))
    peak = jnp.min(jnp.where(live & (hist >= mx), lane, ORI_PAD))
    sel = lambda idx: jnp.sum(jnp.where(lane == idx, hist, 0.0))
    hp = sel(peak)
    hl = sel((peak - 1) % HIST)
    hr = sel((peak + 1) % HIST)
    denom = hl - 2.0 * hp + hr
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0)
    binp = peak.astype(jnp.float32) + jnp.clip(off, -0.5, 0.5)
    theta = (binp / HIST - 0.5) * 2.0 * jnp.pi

    # Rotated descriptor grid in image coords, clamped to the octave rect.
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (1, DESC_N), 1)[0]
    dyg = (lane_d // 16).astype(jnp.float32) - 7.5
    dxg = (lane_d % 16).astype(jnp.float32) - 7.5
    spacing = 0.75 * sigma
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    dx = (ct * dxg - st * dyg) * spacing
    dy = (st * dxg + ct * dyg) * spacing
    ys_d = jnp.clip(ky + dy, 0.0, ymax) - y0f
    xs_d = jnp.clip(kx + dx, 0.0, xmax) - x0f
    gxd, gyd = _sample(pgx, pgy, ys_d, xs_d, DESC_N)

    out_ref[0, 0, :] = gxd
    out_ref[0, 1, :] = gyd
    out_ref[0, 2, :] = jnp.full((DESC_N,), theta, jnp.float32)


_ORI_CONST = _ori_grid()


@functools.partial(jax.jit, static_argnames=("interpret",))
def orient_desc_samples(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    ky: jnp.ndarray,
    kx: jnp.ndarray,
    lvl: jnp.ndarray,
    sigma: jnp.ndarray,
    ymax: jnp.ndarray,
    xmax: jnp.ndarray,
    interpret: bool = False,
):
    """Per-keypoint theta + rotated 16x16 gradient samples, one fused pass.

    gx, gy: (L, H, W) gradient level stacks; ky/kx/sigma/ymax/xmax: (K,).
    Returns (gxs, gys, theta): (K, 256), (K, 256), (K,)."""
    K = ky.shape[0]
    L, H, W = gx.shape
    Hp = -(-max(H, PATCH_Y) // 8) * 8
    Wp = -(-max(W, PATCH_X) // 128) * 128
    if (Hp, Wp) != (H, W):
        gx = jnp.pad(gx, ((0, 0), (0, Hp - H), (0, Wp - W)))
        gy = jnp.pad(gy, ((0, 0), (0, Hp - H), (0, Wp - W)))

    # Window base: worst-case rotated radius (theta is decided in-kernel).
    r = 7.5 * math.sqrt(2.0) * 0.75 * sigma + 2.0
    r = jnp.maximum(r, 4.5 * 0.9 * sigma + 2.0)
    ymin = jnp.clip((jnp.floor(ky - r).astype(jnp.int32) // 8) * 8,
                    0, Hp - PATCH_Y)
    xmin = jnp.clip((jnp.floor(kx - r).astype(jnp.int32) // 128) * 128,
                    0, Wp - PATCH_X)
    lyx0 = jnp.stack([lvl.astype(jnp.int32), ymin, xmin], axis=0)  # (3, K)

    # Orientation sample coords in image frame (shared clamp semantics with
    # features/descriptor.py::_sample_gradients).
    dyg, dxg, _ = _ORI_CONST
    sp = 0.9 * sigma[:, None]
    ys_o = jnp.clip(ky[:, None] + dyg[None, :] * sp, 0.0, ymax[:, None])
    xs_o = jnp.clip(kx[:, None] + dxg[None, :] * sp, 0.0, xmax[:, None])

    par = jnp.zeros((K, 1, 128), jnp.float32)
    par = par.at[:, 0, 0].set(ky)
    par = par.at[:, 0, 1].set(kx)
    par = par.at[:, 0, 2].set(sigma)
    par = par.at[:, 0, 3].set(ymax)
    par = par.at[:, 0, 4].set(xmax)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ORI_PAD), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ORI_PAD), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, DESC_N), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, PATCH_Y, PATCH_X), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 3, DESC_N), jnp.float32),
        interpret=interpret,
    )(lyx0, par, ys_o[:, None, :], xs_o[:, None, :], gx, gy)
    return out[:, 0, :], out[:, 1, :], out[:, 2, 0]
