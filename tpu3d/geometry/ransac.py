"""Batched-hypothesis RANSAC.

OpenCV's RANSAC (used at ref sfm.py:108,116 and matching.py:134) is a serial
CPU loop with data-dependent early exit — the opposite of what XLA wants.
Here RANSAC is one fused batched program: draw a *fixed* budget of M
hypotheses up front, solve all minimal problems as one `vmap`, score every
hypothesis against every point as one (M, N) computation, and argmax the
inlier count. No data-dependent control flow; padded points are masked out,
so the whole thing jits once for a fixed (M, N) capacity.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _sample_indices(key, valid: jnp.ndarray, num_hypotheses: int, sample_size: int) -> jnp.ndarray:
    """(M, s) indices drawn without replacement from the valid set.

    Gumbel-top-k trick: per-hypothesis iid gumbel noise, invalid entries at
    -inf, take the top-s — uniform w/o replacement over valid indices."""
    n = valid.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    g = jnp.where(valid[None, :] > 0, g, -jnp.inf)
    if jax.default_backend() == "cpu":
        # LAPACK-style partial sort is fast on CPU.
        _, idx = jax.lax.top_k(g, sample_size)
        return idx
    # On TPU lax.top_k over a (M, 2048) operand lowers to a full sort;
    # s<=8 vectorized argmax sweeps are pure VPU work (the iota/compare
    # mask avoids a scatter). Both paths select the SAME indices in the
    # same (descending-gumbel) order.
    cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    idxs = []
    for _ in range(sample_size):
        j = jnp.argmax(g, axis=-1)
        idxs.append(j)
        g = jnp.where(cols == j[:, None], -jnp.inf, g)
    return jnp.stack(idxs, axis=-1).astype(jnp.int32)


def ransac(
    key: jax.Array,
    solver: Callable[[jnp.ndarray], jnp.ndarray],
    scorer: Callable[[jnp.ndarray], jnp.ndarray],
    valid: jnp.ndarray,
    sample_size: int,
    num_hypotheses: int,
    threshold_sq: float | jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generic batched RANSAC.

    Args:
      solver: minimal solver, maps (sample_size,) int32 indices -> model
        (any array pytree); vmapped over hypotheses.
      scorer: maps model -> (N,) squared errors for all N points; vmapped.
      valid: (N,) 0/1 mask of usable points (padding support).
      threshold_sq: inlier gate on squared error.

    Returns: (best_model, inlier_mask (N,) bool, inlier_count scalar).
    """
    idx = _sample_indices(key, valid, num_hypotheses, sample_size)
    models = jax.vmap(solver)(idx)
    errors = jax.vmap(scorer)(models)  # (M, N)
    inliers = (errors < threshold_sq) & (valid > 0)[None, :]
    counts = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    return best_model, inliers[best], counts[best]
