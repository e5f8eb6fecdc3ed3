"""High-level robust estimators: the jit-compiled replacements for the
cv2.findEssentialMat / cv2.recoverPose combos used throughout the reference
(matching.py:134-139, sfm.py:108-120). One call = one fused XLA program:
hypothesis sampling, batched 8-point solves, Sampson scoring, inlier-set
refit, pose decomposition and cheirality vote.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3d.geometry.epipolar import (essential_eight_point,
                                     project_to_essential, sampson_error)
from tpu3d.geometry.pose import recover_pose
from tpu3d.geometry.ransac import ransac

E_SAMPLE_SIZE = 8


class EssentialResult(NamedTuple):
    E: jnp.ndarray           # (3, 3)
    R: jnp.ndarray           # (3, 3) world->cam1 (cam0 = I)
    t: jnp.ndarray           # (3,) unit translation
    inliers: jnp.ndarray     # (N,) bool — Sampson inliers of the refit E
    front: jnp.ndarray       # (N,) bool — cheirality-positive subset
    num_inliers: jnp.ndarray # scalar int


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def find_essential_ransac(
    key: jax.Array,
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    valid: jnp.ndarray,
    focal: jnp.ndarray | float,
    threshold_px: float = 1.0,
    num_hypotheses: int = 512,
) -> EssentialResult:
    """Essential matrix + relative pose from padded centered-pixel matches.

    uv0, uv1: (N, 2) centered image coordinates (reference convention),
    valid: (N,) mask. Scoring uses the Sampson distance with the pixel
    threshold converted to normalized units (thr/f)² — matching the
    reference's threshold=1px at prob .999 (sfm.py:108)."""
    with jax.default_matmul_precision("float32"):  # bf16 MXU breaks 8-point
        x0 = uv0 / focal
        x1 = uv1 / focal
        thr_sq = (threshold_px / focal) ** 2

        import os

        _legacy = (os.environ.get("TPU3D_GATE_LEGACY", "") == "1"
                   or os.environ.get("TPU3D_GATE_FAST8", "1") == "0")

        def solver(idx):
            # Hypotheses ARE projected to the essential manifold before
            # scoring. Scoring the unconstrained F looked like a free 3x3-
            # SVD saving but is UNSAFE: a noisy minimal sample's F can win
            # the consensus vote while sitting far from the manifold, and
            # the post-hoc projection then destroys its inlier set
            # (observed: adjacent real frames with 179 raw matches gating
            # to front=0). Winner selection must happen on the manifold.
            # r5: the per-hypothesis projection uses the closed-form path
            # (batched 3x3 SVD is a serial XLA loop, 3.5x slower); the
            # guarded LS refits and the returned winner keep exact SVD.
            if _legacy:
                return essential_eight_point(x0[idx], x1[idx])
            from tpu3d.geometry.fivepoint import _project_essential_fast

            F = essential_eight_point(x0[idx], x1[idx], project=False)
            return _project_essential_fast(F)

        def scorer(E):
            return sampson_error(E, x0, x1)

        key0, key1 = jax.random.split(key)
        E, inliers, count = ransac(key0, solver, scorer, valid, E_SAMPLE_SIZE, num_hypotheses, thr_sq)
        # LO-RANSAC inner round: re-draw minimal samples from the inlier
        # set only (all-inlier 8-point hypotheses are well-conditioned) and
        # keep the winner — never accept a model with fewer inliers than
        # the best minimal hypothesis. A least-squares refit over the full
        # inlier set is NOT used: the many-point algebraic fit's smallest
        # eigenvalue sinks below float32 eigensolver noise and can collapse
        # the consensus (observed: 799-inlier minimal model -> 0 after two
        # LS refits).
        E2, inliers2, count2 = ransac(
            key1, solver, scorer, inliers.astype(x0.dtype), E_SAMPLE_SIZE,
            max(num_hypotheses // 2, 64), thr_sq,
        )
        better = count2 > count
        E = jnp.where(better, E2, E)
        inliers = jnp.where(better, inliers2, inliers)
        count = jnp.maximum(count, count2)
        # Guarded LS refit: when the full-inlier-set algebraic fit IS
        # well-conditioned (clean low-noise sets) it sharpens the model —
        # accept it only if it does not shrink the consensus.
        E3 = essential_eight_point(x0, x1, inliers.astype(x0.dtype))
        err3 = sampson_error(E3, x0, x1)
        inliers3 = (err3 < thr_sq) & (valid > 0)
        better3 = jnp.sum(inliers3) >= count
        E = jnp.where(better3, E3, E)
        inliers = jnp.where(better3, inliers3, inliers)
        # The winning minimal/LO model is an unprojected F — project it to
        # the essential manifold once and refresh its consensus set so the
        # returned (E, inliers) pair is self-consistent.
        E = project_to_essential(E)
        errp = sampson_error(E, x0, x1)
        inliers = (errp < thr_sq) & (valid > 0)
        count = jnp.sum(inliers)
        # One more guarded LS polish on the projected winner's consensus:
        # recovers the slight accuracy the unprojected hypothesis scoring
        # gives up, at the cost of a single 9x9 eigensolve per pair.
        E4 = essential_eight_point(x0, x1, inliers.astype(x0.dtype))
        err4 = sampson_error(E4, x0, x1)
        inliers4 = (err4 < thr_sq) & (valid > 0)
        better4 = jnp.sum(inliers4) >= count
        E = jnp.where(better4, E4, E)
        inliers = jnp.where(better4, inliers4, inliers)
        R, t, front = recover_pose(E, x0, x1, inliers.astype(x0.dtype))
        return EssentialResult(E, R, t, inliers, front & inliers, jnp.sum(inliers))
