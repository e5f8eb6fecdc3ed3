"""Radial scene contraction (mip-NeRF 360 style) for unbounded scenes.

Round-2 measurement (benchmarks/dense_norm_probe.py): ystad_kloster
reconstructions are a concentrated core plus a thin far shell — under any
LINEAR normalization the core occupies only ~1-2.5% of the voxel volume,
which is the structural cause of the dense PSNR plateau (BASELINE.md).
The fix is the standard unbounded-scene warp

    contract(x) = x                      if ||x|| <= 1
                  (2 - 1/||x||) x/||x||  otherwise

mapping all of space into the open ball of radius 2: the core keeps
linear resolution over half the grid per axis while every far point
remains representable in the outer shell (composing with the learned SH
background for true infinity). Sample positions are warped at QUERY time
only — ray marching stays Euclidean in t, so transmittance math is
unchanged.

Reference anchor: the reference's fixed hn=2/hf=6 band + externally
normalized dataset (plenoxel.py:126-133) sidesteps the problem by hand;
this is the principled replacement.
"""
from __future__ import annotations

import jax.numpy as jnp


def contract(pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world/normalized points -> contracted ball of radius 2.
    Smooth (C1) at the unit sphere; safe gradients at the origin."""
    n = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    n = jnp.maximum(n, 1e-9)
    warped = (2.0 - 1.0 / n) * (pts / n)
    return jnp.where(n <= 1.0, pts, warped)


def contract_inv(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse warp: contracted coords (||y|| < 2) -> world coords.
    Used by mesh extraction / band math; ||y|| >= 2 is clamped just
    inside the shell."""
    n = jnp.linalg.norm(y, axis=-1, keepdims=True)
    n = jnp.clip(n, 1e-9, 2.0 - 1e-4)
    unwarped = y / (n * (2.0 - n))
    return jnp.where(n <= 1.0, y, unwarped)
