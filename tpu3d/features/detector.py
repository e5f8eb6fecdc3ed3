"""DoG keypoint detection: batched extrema, NMS, sub-pixel refinement.

Everything is fixed-shape and mask-based: each octave yields exactly K
candidate slots (scored 0 if absent), and the global top-K across octaves
gives the reference-compatible 2048-keypoint budget
(feature_extraction.py:10). The 3x3x3 extremum test and spatial NMS are
`reduce_window` max-pools — the XLA-native form of the window NMS the
reference gets from DISK's CUDA NMS.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class OctaveKeypoints(NamedTuple):
    x: jnp.ndarray        # (B, K) octave-local x (subpixel)
    y: jnp.ndarray        # (B, K)
    scale: jnp.ndarray    # (B, K) continuous scale index within octave
    score: jnp.ndarray    # (B, K) |DoG| response, 0 for empty slots
    valid: jnp.ndarray    # (B, K) bool


def _maxpool3d(x: jnp.ndarray) -> jnp.ndarray:
    # Separable: three 3-wide passes == one 3x3x3 window (max is
    # associative), 9 reads/element instead of 27 — XLA does not decompose
    # reduce_window itself (measured 4x on the detect stage).
    for dim in (1, 2, 3):
        win = [1, 1, 1, 1]
        win[dim] = 3
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, tuple(win), (1, 1, 1, 1), "SAME")
    return x


def _minpool3d(x: jnp.ndarray) -> jnp.ndarray:
    for dim in (1, 2, 3):
        win = [1, 1, 1, 1]
        win[dim] = 3
        x = jax.lax.reduce_window(x, jnp.inf, jax.lax.min, tuple(win), (1, 1, 1, 1), "SAME")
    return x


def _edge_mask(d: jnp.ndarray, edge_threshold: float) -> jnp.ndarray:
    """Reject edge-like responses via the 2x2 spatial Hessian ratio test.
    d: (B, S, H, W) DoG levels."""
    dxx = jnp.roll(d, -1, -1) + jnp.roll(d, 1, -1) - 2 * d
    dyy = jnp.roll(d, -1, -2) + jnp.roll(d, 1, -2) - 2 * d
    dxy = 0.25 * (
        jnp.roll(jnp.roll(d, -1, -1), -1, -2)
        + jnp.roll(jnp.roll(d, 1, -1), 1, -2)
        - jnp.roll(jnp.roll(d, -1, -1), 1, -2)
        - jnp.roll(jnp.roll(d, 1, -1), -1, -2)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_threshold
    return (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)


def _neighbors27(dog: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Fetch the 3x3x3 DoG neighborhood of every keypoint.

    TPU: three calls of the Pallas patch-sampling kernel (integer
    coordinates => exact values) — the advanced-indexing gather lowers to
    a ~2048-iteration scalar loop that overflows the TPU register
    allocator. CPU: plain gathers.
    Returns a dict (ds, dy, dx) -> (K,)."""
    import jax as _jax

    out = {}
    if _jax.default_backend() == "tpu":
        from tpu3d.kernels.patch_sample import sample_gradient_patches

        K = s.shape[0]
        offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        ys = jnp.stack([y.astype(jnp.float32) + dy for dy, _ in offs], axis=1)
        xs = jnp.stack([x.astype(jnp.float32) + dx for _, dx in offs], axis=1)
        ys = jnp.concatenate([ys, jnp.broadcast_to(ys[:, :1], (K, 128 - 9))], axis=1)
        xs = jnp.concatenate([xs, jnp.broadcast_to(xs[:, :1], (K, 128 - 9))], axis=1)
        for ds in (-1, 0, 1):
            lv = jnp.clip(s + ds, 0, dog.shape[0] - 1)
            vals = sample_gradient_patches(dog, dog, ys, xs, lv)[:, 0, :9]
            for i, (dy, dx) in enumerate(offs):
                out[(ds, dy, dx)] = vals[:, i]
    else:
        for ds in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    out[(ds, dy, dx)] = dog[s + ds, y + dy, x + dx]
    return out


def _subpixel_offsets(dog: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """3D quadratic refinement at integer extrema (s, y, x) of one image's
    DoG stack (S+2, H, W). Returns (K, 3) offsets clamped to ±0.6.
    Damped 3x3 Newton solve in closed adjugate form — no linalg."""
    nb = _neighbors27(dog, s, y, x)

    def at(ds, dy, dx):
        return nb[(ds, dy, dx)]

    c = at(0, 0, 0)
    gs = 0.5 * (at(1, 0, 0) - at(-1, 0, 0))
    gy = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    gx = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    hss = at(1, 0, 0) + at(-1, 0, 0) - 2 * c
    hyy = at(0, 1, 0) + at(0, -1, 0) - 2 * c
    hxx = at(0, 0, 1) + at(0, 0, -1) - 2 * c
    hsy = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))
    hsx = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
    hyx = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))

    d = 1e-6
    a, b_, c_ = hss + d, hsy, hsx
    e, f = hyy + d, hyx
    i = hxx + d
    co00 = e * i - f * f
    co01 = c_ * f - b_ * i
    co02 = b_ * f - c_ * e
    co11 = a * i - c_ * c_
    co12 = b_ * c_ - a * f
    co22 = a * e - b_ * b_
    det = a * co00 + b_ * co01 + c_ * co02
    det = jnp.where(jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det)
    off_s = -(co00 * gs + co01 * gy + co02 * gx) / det
    off_y = -(co01 * gs + co11 * gy + co12 * gx) / det
    off_x = -(co02 * gs + co12 * gy + co22 * gx) / det
    return jnp.clip(jnp.stack([off_s, off_y, off_x], axis=-1), -0.6, 0.6)


def _dense_subpixel_offsets(dog: jnp.ndarray):
    """Subpixel offsets at EVERY interior DoG voxel, as three dense maps.

    dog: (B, S+2, H, W). Returns (off_s, off_y, off_x), each (B, S, H, W).

    Same damped-Newton adjugate solve as :func:`_subpixel_offsets`, but
    computed densely with rolls instead of per-keypoint 27-neighborhood
    gathers: the arithmetic is ~60 VPU flops/voxel (about a millisecond at
    octave-0 shape), while the gather formulation needed three Pallas
    patch-sampling dispatches of one grid instance per keypoint — the
    dominant cost of the detect stage. Rolls wrap at the image border, but
    the detector's 8-px border mask discards those voxels."""

    def sh(ds, dy, dx):
        a = dog
        for ax, d in ((1, ds), (2, dy), (3, dx)):
            if d:
                a = jnp.roll(a, -d, ax)
        return a[:, 1:-1]

    c = dog[:, 1:-1]
    gs = 0.5 * (sh(1, 0, 0) - sh(-1, 0, 0))
    gy = 0.5 * (sh(0, 1, 0) - sh(0, -1, 0))
    gx = 0.5 * (sh(0, 0, 1) - sh(0, 0, -1))
    hss = sh(1, 0, 0) + sh(-1, 0, 0) - 2 * c
    hyy = sh(0, 1, 0) + sh(0, -1, 0) - 2 * c
    hxx = sh(0, 0, 1) + sh(0, 0, -1) - 2 * c
    hsy = 0.25 * (sh(1, 1, 0) - sh(1, -1, 0) - sh(-1, 1, 0) + sh(-1, -1, 0))
    hsx = 0.25 * (sh(1, 0, 1) - sh(1, 0, -1) - sh(-1, 0, 1) + sh(-1, 0, -1))
    hyx = 0.25 * (sh(0, 1, 1) - sh(0, 1, -1) - sh(0, -1, 1) + sh(0, -1, -1))

    d = 1e-6
    a, b_, c_ = hss + d, hsy, hsx
    e, f = hyy + d, hyx
    i = hxx + d
    co00 = e * i - f * f
    co01 = c_ * f - b_ * i
    co02 = b_ * f - c_ * e
    co11 = a * i - c_ * c_
    co12 = b_ * c_ - a * f
    co22 = a * e - b_ * b_
    det = a * co00 + b_ * co01 + c_ * co02
    det = jnp.where(jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det)
    off_s = -(co00 * gs + co01 * gy + co02 * gx) / det
    off_y = -(co01 * gs + co11 * gy + co12 * gx) / det
    off_x = -(co02 * gs + co12 * gy + co22 * gx) / det
    clip = lambda v: jnp.clip(v, -0.6, 0.6)
    return clip(off_s), clip(off_y), clip(off_x)


def _topk_segmented(flat: jnp.ndarray, k: int, nseg: int = 16):
    """EXACT top-k via segment-local top-k + a merge top-k.

    Round-3 TPU forensics: `lax.top_k` over the (B, ~1.9M) octave score
    map costs ~290 ms per batch when compiled INSIDE the extract program
    (vs 12 ms as a standalone program on identical data — a pathological
    lowering interaction, reproduced minimally and immune to
    optimization_barrier / while_loop materialization). Splitting into
    nseg segment sorts of the SAME total length compiles to the fast
    path: 43 ms in-program. Exactness: every global top-k element is in
    its own segment's top-k (segments are padded with -1.0, which never
    beats the >= 0 NMS scores).
    Returns (vals, idx) with idx into the UNPADDED flat array."""
    B, N = flat.shape
    pad = (-N) % nseg
    xp = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=-1.0)
    L = xp.shape[1] // nseg
    seg = xp.reshape(B, nseg, L)
    v, i = jax.lax.top_k(seg, k)                        # (B, nseg, k)
    base = (jnp.arange(nseg, dtype=i.dtype) * L)[None, :, None]
    fi = (i + base).reshape(B, nseg * k)
    fv = v.reshape(B, nseg * k)
    v2, i2 = jax.lax.top_k(fv, k)
    return v2, jnp.take_along_axis(fi, i2, axis=1)


def _topk_threshold(flat: jnp.ndarray, k: int):
    """Exact top-k SET selection without a sort.

    `lax.top_k` over a (B, ~2M) score map lowers to a full TPU sort — the
    dominant cost of octave detection. NMS'd score maps are ~99.9% zeros,
    so: per-image binary search for the threshold whose exceedance count is
    <= k (26 memory-bound reduction passes), then static-size nonzero
    compaction of the survivors. Returns (vals, idx) with zero-filled empty
    slots — the same SET as top_k (selection order differs: ascending index
    instead of descending score; every consumer is order-independent, and
    the frontend's cross-octave merge re-top-ks over 4*K candidates
    anyway). Distinct float scores => set-exact; equal scores straddling
    the k-boundary can drop a tied element (negligible at k=2048)."""
    B, N = flat.shape

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(flat > mid[:, None], axis=1)
        take_hi = cnt > k
        return jnp.where(take_hi, mid, lo), jnp.where(take_hi, hi, mid)

    lo = jnp.zeros((B,), flat.dtype)
    hi = jnp.max(flat, axis=1)
    lo, hi = jax.lax.fori_loop(0, 26, body, (lo, hi))
    flag = flat > hi[:, None]
    idx = jax.vmap(lambda f: jnp.nonzero(f, size=k, fill_value=0)[0])(flag)
    vals = jnp.take_along_axis(flat, idx, axis=1)
    n = jnp.sum(flag, axis=1)
    slot_valid = jnp.arange(k)[None, :] < n[:, None]
    return jnp.where(slot_valid, vals, 0.0), idx


@functools.partial(jax.jit, static_argnames=("k", "contrast_threshold", "edge_threshold", "nms_radius", "approx_recall"))
def detect_octave(
    dog: jnp.ndarray,
    k: int,
    contrast_threshold: float = 0.015,
    edge_threshold: float = 10.0,
    nms_radius: int = 2,
    approx_recall: float = 0.0,
) -> OctaveKeypoints:
    """Top-k DoG extrema of one octave. dog: (B, S+2, H, W)."""
    B, Sp2, H, W = dog.shape
    S = Sp2 - 2
    interior = dog[:, 1 : S + 1]
    is_max = interior >= _maxpool3d(dog)[:, 1 : S + 1] - 1e-12
    is_min = interior <= _minpool3d(dog)[:, 1 : S + 1] + 1e-12
    strong = jnp.abs(interior) > contrast_threshold
    not_edge = _edge_mask(interior, edge_threshold)
    mask = (is_max | is_min) & strong & not_edge
    score = jnp.abs(interior) * mask

    if nms_radius > 1:
        win = 2 * nms_radius + 1
        pooled = jax.lax.reduce_window(
            score, -jnp.inf, jax.lax.max, (1, 1, win, 1), (1, 1, 1, 1), "SAME"
        )
        pooled = jax.lax.reduce_window(
            pooled, -jnp.inf, jax.lax.max, (1, 1, 1, win), (1, 1, 1, 1), "SAME"
        )
        score = jnp.where(score >= pooled, score, 0.0)

    # Kill the image border (descriptor support must fit).
    border = 8
    bm = jnp.zeros((H, W), bool).at[border : H - border, border : W - border].set(True)
    score = score * bm[None, None]

    flat = score.reshape(B, -1)
    # approx_recall > 0 switches to lax.approx_max_k (sub-1.0 recall drops
    # threshold-adjacent keypoints); the EXACT default is the segmented
    # top-k — see _topk_segmented for the in-program lax.top_k pathology
    # it works around (290 -> 43 ms/batch on octave 0). Small maps (tests,
    # high octaves of tiny images) keep the plain op.
    if approx_recall > 0.0:
        vals, idx = jax.lax.approx_max_k(flat, k, recall_target=approx_recall)
    elif flat.shape[1] >= max(1 << 17, 16 * k):  # each segment needs >= k
        vals, idx = _topk_segmented(flat, k)
    else:
        vals, idx = jax.lax.top_k(flat, k)
    s_idx = idx // (H * W)
    rem = idx % (H * W)
    y_idx = rem // W
    x_idx = rem % W

    # Dense subpixel maps + flat top-k gathers (the known-fast gather shape
    # on TPU) — replaces three Pallas patch dispatches per image.
    off_s, off_y, off_x = _dense_subpixel_offsets(dog)
    take = lambda m: jnp.take_along_axis(m.reshape(B, -1), idx, axis=1)
    valid = vals > 0
    return OctaveKeypoints(
        x=x_idx.astype(jnp.float32) + take(off_x),
        y=y_idx.astype(jnp.float32) + take(off_y),
        scale=s_idx.astype(jnp.float32) + 1.0 + take(off_s),
        score=jnp.where(valid, vals, 0.0),
        valid=valid,
    )
