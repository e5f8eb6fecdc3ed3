"""Pallas TPU kernel: batched bilinear gradient-patch sampling for the
descriptor front-end.

The jnp descriptor path gathers ~256 bilinear samples per keypoint with
advanced indexing; on TPU that lowers to scalar address arithmetic that
(a) compiles pathologically and (b) overflows the scalar register
allocator beyond batch 4 (see features/detector.py history). This kernel
replaces every gather with DMA + matmuls:

  per keypoint (one grid instance, scalar-prefetched coordinates):
    1. DMA a PATCH x PATCH window of the gradient images around the
       keypoint from HBM into VMEM (dynamic base indices from prefetch);
    2. express bilinear interpolation as TWO matmuls: sample_i =
       Σ_y Σ_x Wrow[i,y]·patch[y,x]·Wcol[i,x] = rowwise-dot(Wrow @ patch,
       Wcol) — the one-hot-pair weight matrices are built with iota
       comparisons, so the whole kernel is vector/MXU work, zero gathers.

Outputs (K, S, 2) gradient samples (gx, gy). The orientation/histogram
math stays in jnp where it is already matmul-shaped.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM window per keypoint. The DMA base offsets must be provably aligned
# to the (8, 128) float32 tiling, so corners are rounded down to those
# multiples and the window is widened to keep the sample cloud covered:
# max supported sample spread is PATCH_Y-8-2 rows / PATCH_X-128-2 cols.
# PATCH_Y=80 covers the worst-case rotated max-sigma descriptor grid
# (~58-row span + 8 alignment + 2 margin + 1 bilinear neighbor = 69 < 70
# usable) — 64 silently clamped outer-ring samples (see the bound analysis
# in kernels/orient_desc.py, which uses 96 for the same reason). Staying
# <= 128 keeps the per-sample MXU tile count unchanged.
PATCH_Y = 80
PATCH_X = 256
# Max samples per keypoint (16x16 descriptor grid). The kernel's sample
# axis is whatever width the caller's ys/xs carry (a multiple of 128 —
# the orientation pass runs at 128, the descriptor pass at 256: padding
# the 121-sample orientation grid to 256 doubled its matmul work).
NSAMP = 256


def _weights(frac_pos: jnp.ndarray, width: int,
             quantize_bf16: bool = False) -> jnp.ndarray:
    """(S,) continuous in-patch positions -> (S, width) bilinear one-hot
    pair weights via iota comparisons.

    quantize_bf16 (the split2 path): round the FRACTION to bf16 before
    building the pair — the weights then carry at most a 2^-9 positional
    perturbation (far below subpixel-refinement noise) instead of a VALUE
    rounding error inside the matmul."""
    p0 = jnp.floor(frac_pos)
    f = frac_pos - p0
    if quantize_bf16:
        f = f.astype(jnp.bfloat16).astype(jnp.float32)
    p0i = p0.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (frac_pos.shape[0], width), 1)
    w0 = jnp.where(iota == p0i[:, None], 1.0 - f[:, None], 0.0)
    w1 = jnp.where(iota == p0i[:, None] + 1, f[:, None], 0.0)
    return w0 + w1


def _patch_kernel(lyx0_ref, ys_ref, xs_ref, gx_hbm, gy_hbm, out_ref, patch, sem,
                  *, precision=None):
    """Grid = one instance per keypoint, DOUBLE-BUFFERED: instance k waits
    on the patch DMA that instance k-1 issued for it (slot k%2) and starts
    instance k+1's DMA into the other slot first, so the ~patch-sized HBM
    fetch rides under the previous keypoint's matmuls. The serial
    start-wait-compute form left the DMA latency exposed on every one of
    the K grid instances — the dominant cost of the descriptor stage."""
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

    ys = ys_ref[0, 0, :] - lyx0_ref[1, k].astype(jnp.float32)  # in-patch (S,)
    xs = xs_ref[0, 0, :] - lyx0_ref[2, k].astype(jnp.float32)
    split2 = precision == "split2"
    wr = _weights(jnp.clip(ys, 0.0, PATCH_Y - 2.0), PATCH_Y,
                  quantize_bf16=split2)                        # (S, PATCH_Y)
    wc = _weights(jnp.clip(xs, 0.0, PATCH_X - 2.0), PATCH_X,
                  quantize_bf16=split2)

    cp, cp2 = _copies(k, slot)
    cp.wait()
    cp2.wait()

    # sample = rowwise_dot(Wrow @ patch, Wcol): two MXU matmuls + reduce.
    # Precision (FrontendConfig.patch_precision): "highest" = 6-pass bf16
    # (exact f32, the proven-safe default); "default" = 1-pass bf16
    # (~1e-2 sample error, measured quality loss); "split2" = bf16-exact
    # one-hot weights (fraction quantized, see _weights) x a hi/lo bf16
    # SPLIT of the patch values -> TWO DEFAULT-precision passes recover
    # ~f32 accuracy at 1/3 the MXU work of HIGHEST.
    if split2:
        def mm2(w, v):
            # Explicit DEFAULT precision: the frontend traces under a
            # default_matmul_precision("float32") scope, and a bf16 dot
            # inheriting HIGHEST is unlowerable by Mosaic (observed as a
            # tpu_compile_helper crash).
            v_hi = v.astype(jnp.bfloat16)
            v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)
            prec = jax.lax.Precision.DEFAULT
            return (jnp.dot(wb, v_hi, preferred_element_type=jnp.float32,
                            precision=prec)
                    + jnp.dot(wb, v_lo, preferred_element_type=jnp.float32,
                              precision=prec))

        rgx = mm2(wr, patch[slot, 0])
        rgy = mm2(wr, patch[slot, 1])
    else:
        prec = jax.lax.Precision.HIGHEST if precision is None else precision
        rgx = jnp.dot(wr, patch[slot, 0], preferred_element_type=jnp.float32,
                      precision=prec)  # (S, PATCH)
        rgy = jnp.dot(wr, patch[slot, 1], preferred_element_type=jnp.float32,
                      precision=prec)
    out_ref[0, 0, :] = jnp.sum(rgx * wc, axis=1)
    out_ref[0, 1, :] = jnp.sum(rgy * wc, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def sample_gradient_patches(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    lvl: jnp.ndarray | None = None,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Bilinear samples of (gx, gy) at per-keypoint coordinate grids.

    gx, gy: (H, W) or (L, H, W) float32 gradient images; with a level
    stack, `lvl` gives each keypoint's (int32) level.
    ys, xs: (K, S) float sample coordinates (image frame), S a multiple
    of 128 (<= NSAMP).
    Returns (K, 2, S) = (gx, gy) samples. Coordinates must fit a
    PATCH-sized window per keypoint; callers keep keypoints away from the
    border (the detector's border margin already does)."""
    K, S = ys.shape
    if gx.ndim == 2:
        gx = gx[None]
        gy = gy[None]
    if lvl is None:
        lvl = jnp.zeros((K,), jnp.int32)
    L, H, W = gx.shape
    # Pad the images so aligned windows always fit, and round the corners
    # down to the (8, 128) tiling (Mosaic must prove DMA-slice alignment).
    Hp = -(-max(H, PATCH_Y) // 8) * 8
    Wp = -(-max(W, PATCH_X) // 128) * 128
    if (Hp, Wp) != (H, W):
        gx = jnp.pad(gx, ((0, 0), (0, Hp - H), (0, Wp - W)))
        gy = jnp.pad(gy, ((0, 0), (0, Hp - H), (0, Wp - W)))
    ymin = jnp.min(ys, axis=1).astype(jnp.int32) - 2
    xmin = jnp.min(xs, axis=1).astype(jnp.int32) - 2
    ymin = jnp.clip((ymin // 8) * 8, 0, Hp - PATCH_Y)
    xmin = jnp.clip((xmin // 128) * 128, 0, Wp - PATCH_X)
    # (3, K) layout: an SMEM-prefetched (K, 3) array pads its last dim to
    # the 128-lane width and blows the 1MB SMEM budget at K=2048.
    yx0 = jnp.stack([lvl.astype(jnp.int32), ymin, xmin], axis=0)  # (3, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # yx0
        grid=(K,),
        in_specs=[
            # (K, 1, S) with block (1, 1, S): Mosaic requires the trailing
            # two block dims divisible by (8, 128) OR equal to the array
            # dims — the singleton middle axis satisfies that.
            pl.BlockSpec((1, 1, S), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # gx stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # gy stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 2, S), lambda k, yx0: (k, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            # (slot, gx/gy, PATCH_Y, PATCH_X): two DMA slots for the
            # cross-instance double buffering.
            pltpu.VMEM((2, 2, PATCH_Y, PATCH_X), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    # Mosaic's dot lowering supports only DEFAULT (1-pass bf16) and
    # HIGHEST (6-pass f32) — there is no 3-pass HIGH; "split2" is our own
    # 2-pass hi/lo decomposition (see _patch_kernel).
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
            "split2": "split2"}[precision]
    return pl.pallas_call(
        functools.partial(_patch_kernel, precision=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 2, S), jnp.float32),
        interpret=interpret,
    )(yx0, ys[:, None, :], xs[:, None, :], gx, gy)


def sample_gradient_patches_reference(gx, gy, ys, xs, lvl=None):
    """Pure-jnp oracle (the gather formulation) for kernel tests."""
    if gx.ndim == 3:
        l = lvl if lvl is not None else jnp.zeros(ys.shape[0], jnp.int32)
        gx2 = gx[l]  # (K, H, W) gathered per keypoint
        gy2 = gy[l]
        H, W = gx.shape[1:]
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
        fy = jnp.clip(ys, 0, H - 2.0) - y0
        fx = jnp.clip(xs, 0, W - 2.0) - x0
        ki = jnp.arange(ys.shape[0])[:, None]

        def bil(img):
            v00 = img[ki, y0, x0]
            v01 = img[ki, y0, x0 + 1]
            v10 = img[ki, y0 + 1, x0]
            v11 = img[ki, y0 + 1, x0 + 1]
            return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
                    + v10 * fy * (1 - fx) + v11 * fy * fx)

        return jnp.stack([bil(gx2), bil(gy2)], axis=-1)
    H, W = gx.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
    fy = jnp.clip(ys, 0, H - 2.0) - y0
    fx = jnp.clip(xs, 0, W - 2.0) - x0

    def bil(img):
        v00 = img[y0, x0]
        v01 = img[y0, x0 + 1]
        v10 = img[y0 + 1, x0]
        v11 = img[y0 + 1, x0 + 1]
        return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
                + v10 * fy * (1 - fx) + v11 * fy * fx)

    return jnp.stack([bil(gx), bil(gy)], axis=-1)
