"""Rotation-invariant 128-D gradient-histogram (SIFT-style) descriptors.

The descriptor path is one big batched gather + einsum program: every
keypoint samples a rotated 16x16 gradient grid by bilinear interpolation
(4 gathers), orientation histograms are built by one-hot matmuls (MXU
friendly — no serial scatter), and the 4x4x8 binning is a reshape-sum.
The whole octave's 2048 keypoints are processed as a single XLA batch.

This provides the reference pipeline's descriptor capability
(feature_extraction.py's DISK descriptors) in the "SIFT baseline" form
named by BASELINE.json configs[0]; descriptors are L2-normalized so the
downstream matcher's dot-product distance (matching/mnn.py) applies
unchanged.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

GRID = 16          # descriptor sample grid (GRID x GRID)
CELLS = 4          # spatial cells per side
ORI_BINS = 8       # orientation bins per cell
HIST_BINS = 36     # orientation-assignment histogram


def gradients(levels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients of (L, H, W) gaussian levels."""
    gx = 0.5 * (jnp.roll(levels, -1, -1) - jnp.roll(levels, 1, -1))
    gy = 0.5 * (jnp.roll(levels, -1, -2) - jnp.roll(levels, 1, -2))
    return gx, gy


def _bilinear(img: jnp.ndarray, lvl: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (L, H, W) at float (ys, xs) on integer level lvl.
    lvl: (K, 1) int32 broadcast over samples; ys/xs: (K, N) float."""
    L, H, W = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    l = jnp.broadcast_to(lvl, ys.shape)
    v00 = img[l, y0i, x0i]
    v01 = img[l, y0i, x0i + 1]
    v10 = img[l, y0i + 1, x0i]
    v11 = img[l, y0i + 1, x0i + 1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _use_pallas_sampling() -> bool:
    """Pallas DMA+matmul patch sampling on TPU; jnp gathers elsewhere.
    The gather formulation compiles pathologically on the TPU backend
    (scalar address pressure) and runs ~2800x slower there."""
    import jax

    return jax.default_backend() == "tpu"


def _sample_gradients(gx, gy, lvl, ky, kx, dy, dx, ymax=None, xmax=None,
                      precision="highest"):
    """Gradient samples at kp + offsets. dy/dx: (K, N).

    ymax/xmax: optional (K,) per-keypoint coordinate bounds — samples are
    clamped into [0, bound] so that keypoints near their own octave's
    border sample the border pixels instead of whatever lies beyond (zero
    padding in the unified multi-octave stack). This is the semantics the
    pre-unified CPU path had via index clipping, now uniform across
    backends."""
    ys = ky[:, None] + dy
    xs = kx[:, None] + dx
    if ymax is not None:
        ys = jnp.clip(ys, 0.0, ymax[:, None])
    if xmax is not None:
        xs = jnp.clip(xs, 0.0, xmax[:, None])
    if _use_pallas_sampling():
        from tpu3d.kernels.patch_sample import sample_gradient_patches

        n = ys.shape[1]
        # Pad the sample axis to the next 128-lane multiple only: the
        # orientation pass's 121-sample grid runs at width 128 — padding
        # it to the descriptor pass's 256 doubled its in-kernel matmuls.
        sp = max(128, -(-n // 128) * 128)
        if n < sp:
            ys = jnp.concatenate([ys, jnp.broadcast_to(ys[:, :1], (ys.shape[0], sp - n))], axis=1)
            xs = jnp.concatenate([xs, jnp.broadcast_to(xs[:, :1], (xs.shape[0], sp - n))], axis=1)
        out = sample_gradient_patches(gx, gy, ys, xs, lvl[:, 0],
                                      precision=precision)
        return out[:, 0, :n], out[:, 1, :n]
    return _bilinear(gx, lvl, ys, xs), _bilinear(gy, lvl, ys, xs)


def keypoint_orientations(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    kx: jnp.ndarray,
    ky: jnp.ndarray,
    lvl: jnp.ndarray,
    sigma: jnp.ndarray,
    ymax: jnp.ndarray | None = None,
    xmax: jnp.ndarray | None = None,
    precision: str = "highest",
) -> jnp.ndarray:
    """Dominant gradient orientation per keypoint (radians).

    11x11 sample grid with spacing ~0.9 sigma, gaussian-weighted 36-bin
    soft histogram built by a one-hot matmul, 3-tap circular smoothing,
    argmax + parabolic peak interpolation."""
    R = 5
    offs = jnp.arange(-R, R + 1, dtype=jnp.float32)
    dyg, dxg = jnp.meshgrid(offs, offs, indexing="ij")
    dyg = dyg.reshape(-1)
    dxg = dxg.reshape(-1)  # (N,)
    spacing = 0.9 * sigma[:, None]  # (K, 1)
    dy = dyg[None, :] * spacing
    dx = dxg[None, :] * spacing
    gxs, gys = _sample_gradients(gx, gy, lvl[:, None], ky, kx, dy, dx, ymax,
                                 xmax, precision)
    mag = jnp.sqrt(gxs**2 + gys**2)
    wgt = jnp.exp(-(dyg**2 + dxg**2)[None, :] / (2 * (1.5 * R / 3.0) ** 2))
    ang = jnp.arctan2(gys, gxs)  # [-pi, pi]
    binf = (ang / (2 * jnp.pi) + 0.5) * HIST_BINS  # [0, 36]
    b0 = jnp.floor(binf).astype(jnp.int32) % HIST_BINS
    frac = binf - jnp.floor(binf)
    w = mag * wgt
    oh0 = jax.nn.one_hot(b0, HIST_BINS, dtype=w.dtype)
    oh1 = jax.nn.one_hot((b0 + 1) % HIST_BINS, HIST_BINS, dtype=w.dtype)
    hist = jnp.einsum("kn,knh->kh", w * (1 - frac), oh0) + jnp.einsum(
        "kn,knh->kh", w * frac, oh1
    )
    # circular 3-tap smooth (twice)
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    hp = jnp.take_along_axis(hist, peak[:, None], -1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % HIST_BINS)[:, None], -1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % HIST_BINS)[:, None], -1)[:, 0]
    denom = hl - 2 * hp + hr
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0)
    binp = peak.astype(jnp.float32) + jnp.clip(off, -0.5, 0.5)
    return (binp / HIST_BINS - 0.5) * 2 * jnp.pi


def sift_descriptors(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    kx: jnp.ndarray,
    ky: jnp.ndarray,
    lvl: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    ymax: jnp.ndarray | None = None,
    xmax: jnp.ndarray | None = None,
    precision: str = "highest",
) -> jnp.ndarray:
    """(K, 128) descriptors from one octave's gradient stack."""
    g = (jnp.arange(GRID, dtype=jnp.float32) - (GRID - 1) / 2.0)
    dyg, dxg = jnp.meshgrid(g, g, indexing="ij")
    dyg = dyg.reshape(-1)
    dxg = dxg.reshape(-1)  # (N,) N = 256
    spacing = 0.75 * sigma[:, None]
    ct = jnp.cos(theta)[:, None]
    st = jnp.sin(theta)[:, None]
    # rotate sample offsets by theta
    dx = (ct * dxg[None, :] - st * dyg[None, :]) * spacing
    dy = (st * dxg[None, :] + ct * dyg[None, :]) * spacing
    gxs, gys = _sample_gradients(gx, gy, lvl[:, None], ky, kx, dy, dx, ymax,
                                 xmax, precision)
    return bin_descriptor(gxs, gys, theta, dyg, dxg)


def bin_descriptor(gxs: jnp.ndarray, gys: jnp.ndarray, theta: jnp.ndarray,
                   dyg: jnp.ndarray, dxg: jnp.ndarray) -> jnp.ndarray:
    """4x4x8 gradient-histogram binning + SIFT normalization of (K, 256)
    rotated-grid gradient samples (shared by the split path above and the
    fused orientation+descriptor Pallas kernel)."""
    mag = jnp.sqrt(gxs**2 + gys**2)
    wgt = jnp.exp(-(dyg**2 + dxg**2)[None, :] / (2 * (GRID / 2.0) ** 2))
    w = mag * wgt
    ang = jnp.arctan2(gys, gxs) - theta[:, None]
    binf = (ang / (2 * jnp.pi)) * ORI_BINS
    b0 = jnp.floor(binf).astype(jnp.int32) % ORI_BINS
    frac = binf - jnp.floor(binf)
    oh0 = jax.nn.one_hot(b0, ORI_BINS, dtype=w.dtype)
    oh1 = jax.nn.one_hot((b0 + 1) % ORI_BINS, ORI_BINS, dtype=w.dtype)
    contrib = oh0 * (w * (1 - frac))[..., None] + oh1 * (w * frac)[..., None]  # (K, N, 8)
    K = gxs.shape[0]
    cells = contrib.reshape(K, CELLS, GRID // CELLS, CELLS, GRID // CELLS, ORI_BINS)
    desc = jnp.sum(cells, axis=(2, 4)).reshape(K, CELLS * CELLS * ORI_BINS)
    # SIFT normalization: L2 -> clip 0.2 -> L2.
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    return desc


def orient_and_describe(gx, gy, kx, ky, lvl, sigma, ymax, xmax,
                        fused: bool | None = None,
                        precision: str = "highest",
                        orient_precision: str | None = None):
    """Dominant orientation + descriptor for a keypoint batch.

    fused=True: ONE Pallas dispatch per batch (kernels/orient_desc.py —
    one patch DMA + one grid instance per keypoint instead of two of
    each). TPU-measured SLOWER than the split path at the production
    shape (609 vs 464 ms/batch-of-4): the fused kernel needs a 96-row
    patch window (rotated worst case, vs 64 split) and runs the 36-bin
    histogram/peak scalar work per instance on the VPU — the halved
    instance count doesn't pay for it. Default (None) = the split path
    everywhere; the kernel stays for shapes where DMA latency dominates.
    Returns (desc, theta)."""
    if bool(fused):
        from tpu3d.kernels.orient_desc import orient_desc_samples

        gxs, gys, theta = orient_desc_samples(gx, gy, ky, kx, lvl, sigma,
                                              ymax, xmax)
        g = (jnp.arange(GRID, dtype=jnp.float32) - (GRID - 1) / 2.0)
        dyg, dxg = jnp.meshgrid(g, g, indexing="ij")
        return bin_descriptor(gxs, gys, theta,
                              dyg.reshape(-1), dxg.reshape(-1)), theta
    theta = keypoint_orientations(gx, gy, kx, ky, lvl, sigma, ymax, xmax,
                                  orient_precision or precision)
    return sift_descriptors(gx, gy, kx, ky, lvl, sigma, theta, ymax, xmax,
                            precision), theta
