"""Shared-focal (intrinsic) refinement.

The reference carries this capability as dead code: a residual variant with
the focal as an optimization variable (`sfm.py:93-99`) behind a
commented-out second `least_squares` call (`sfm.py:42-45`) whose result is
discarded either way (`sfm.py:131` reassigns the unchanged K[0][0]). Here
it is a working component, designed for the TPU solver instead of a bigger
Jacobian: the focal enters the problem ONLY through the observation
normalization uv_norm = uv_px / f, so for FIXED geometry the optimal f has
a closed form,

    min_f Σ w ‖π(X_c) − uv_px / f‖²  ⇒  f* = Σ w ‖uv_px‖² / Σ w ⟨π, uv_px⟩,

Naive alternation of (Schur-LM bundle adjust at fixed f) with that
closed-form update STALLS: BA absorbs most of a focal error into a
homogeneous depth deformation (the classic focal-depth near-ambiguity), so
the fixed-geometry f-update barely moves (measured: 750 → 753 against a
true 1000). What stays observable is the CONVERGED BA cost as a function of
f — perspective curvature cannot be faked exactly (measured on a 5-cam ring:
cost 4e-13 at the true focal vs 3e-3 at 0.85×) — so the refinement is a
golden-section minimization of f ↦ min_{geometry} cost(f), each probe one
bundle_adjust call with fixed shapes (no new Jacobian columns, no new
compiled executables), finished by the closed-form polish.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu3d.ba.lm import BAState, bundle_adjust
from tpu3d.core import lie


@jax.jit
def _optimal_focal(cams, points, cam_idx, pt_idx, uv_px, w) -> jnp.ndarray:
    """Closed-form shared focal at fixed geometry (see module docstring).
    Observations behind a camera get zero weight — they would otherwise
    vote with inverted signs."""
    with jax.default_matmul_precision("float32"):
        c = cams[cam_idx]
        X = points[pt_idx]
        R = jax.vmap(lie.so3_exp)(c[:, :3])
        Xc = jnp.einsum("oij,oj->oi", R, X) + c[:, 3:6]
        z = Xc[:, 2]
        w_eff = w * (z > 1e-6)
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        a = Xc[:, :2] / z_safe[:, None]            # π(X_c), normalized pred
        num = jnp.sum(w_eff * jnp.sum(uv_px * uv_px, -1))
        den = jnp.sum(w_eff * jnp.sum(a * uv_px, -1))
        return num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)


def refine_focal(
    cams0: jnp.ndarray,
    points0: jnp.ndarray,
    cam_idx: jnp.ndarray,
    pt_idx: jnp.ndarray,
    uv_px: jnp.ndarray,
    w: jnp.ndarray,
    cam_fixed: jnp.ndarray,
    focal0: float,
    pt_fixed: jnp.ndarray | None = None,
    search_span: float = 0.5,
    iters: int = 24,
    max_iters: int = 12,
    cg_iters: int = 24,
) -> Tuple[float, BAState]:
    """Golden-section shared-focal refinement (see module docstring).

    Same observation layout as ba.lm.bundle_adjust, except uv_px is in
    PIXELS (centered convention) — the focal normalization is what is being
    estimated. Searches log-f over focal0 × [1/(1+span), 1+span].
    Returns (refined_focal, final BAState at that focal)."""
    import math

    def solve(f: float) -> BAState:
        return bundle_adjust(cams0, points0, cam_idx, pt_idx, uv_px / f, w,
                             cam_fixed, pt_fixed, max_iters=max_iters,
                             cg_iters=cg_iters)

    lo = math.log(focal0 / (1.0 + search_span))
    hi = math.log(focal0 * (1.0 + search_span))
    invphi = (5.0**0.5 - 1.0) / 2.0
    a = hi - invphi * (hi - lo)
    b = lo + invphi * (hi - lo)
    fa = float(solve(math.exp(a)).cost)
    fb = float(solve(math.exp(b)).cost)
    for _ in range(iters):
        if fa < fb:
            hi, b, fb = b, a, fa
            a = hi - invphi * (hi - lo)
            fa = float(solve(math.exp(a)).cost)
        else:
            lo, a, fa = a, b, fb
            b = lo + invphi * (hi - lo)
            fb = float(solve(math.exp(b)).cost)
    f = math.exp((lo + hi) / 2.0)
    st = solve(f)
    # Closed-form polish at the solved geometry (exact 1-D optimum there).
    f = float(_optimal_focal(st.cams, st.points, cam_idx, pt_idx, uv_px, w))
    st = solve(f)
    return f, st
