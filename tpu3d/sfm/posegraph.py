"""Global pose-graph initialization: rotation + translation averaging.

The incremental chain (ref sfm.py and our engine) propagates scale/pose
errors camera-by-camera; a weak link either blocks registration or plants
a wrongly-scaled island. This module initializes ALL cameras jointly from
the pairwise relative poses the matching stage already computed (one per
accepted edge):

  1. rotation averaging — chordal relaxation: minimize
     Σ ||M_j − R_ij M_i||_F² over unconstrained 3x3 blocks via the three
     smallest eigenvectors of the (3N, 3N) connection Laplacian, then
     project each block onto SO(3);
  2. translation averaging — with global rotations fixed, each edge gives
     the world-frame baseline direction d_ij = −R_jᵀ t_ij^rel; the camera
     centers satisfy (C_j − C_i) × d_ij = 0, a sparse LINEAR system solved
     least-squares with gauge fixed by C_a = 0 and the scale by
     Σ d_ijᵀ(C_j − C_i) = |E|.

Small dense numpy by design: N ≈ hundreds of cameras means a 3Nx3N
eigensolve and a 3N least squares — milliseconds on the host, and the
heavy work (triangulation, BA) stays in the batched device kernels.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _project_so3(M: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(M)
    d = np.sign(np.linalg.det(U @ Vt))
    return U @ np.diag([1.0, 1.0, d]) @ Vt


def largest_component(n: int, edges: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Node mask of the largest connected component."""
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j in edges:
        a, b = find(i), find(j)
        if a != b:
            parent[b] = a
    roots = np.array([find(i) for i in range(n)])
    vals, counts = np.unique(roots, return_counts=True)
    big = vals[np.argmax(counts)]
    return roots == big


def average_rotations(
    n: int,
    edges: Sequence[Tuple[int, int]],
    rel_R: Sequence[np.ndarray],
    mask: Optional[np.ndarray] = None,
    irls_rounds: int = 3,
) -> np.ndarray:
    """Chordal rotation averaging with IRLS outlier down-weighting.
    rel_R[e] maps cam_i coords to cam_j coords (R_j = rel_R R_i,
    world->cam convention). L2 chordal averaging is poisoned by even a few
    wrong relative poses (real match graphs have them), so edges are
    reweighted by their consistency residual over a few rounds.
    Returns (n, 3, 3) global rotations (identity outside the mask)."""
    if mask is None:
        mask = np.ones(n, bool)
    idx_of = -np.ones(n, np.int64)
    nodes = np.flatnonzero(mask)
    idx_of[nodes] = np.arange(len(nodes))
    m = len(nodes)
    weights = np.ones(len(edges))
    for round_ in range(irls_rounds):
        L = np.zeros((3 * m, 3 * m))
        for w_e, (i, j), Rij in zip(weights, edges, rel_R):
            a, b = idx_of[i], idx_of[j]
            if a < 0 or b < 0:
                continue
            # w·||M_b - R_ij M_a||² contributes: L_aa += wI, L_bb += wI,
            # L_ab += -w R_ijᵀ, L_ba += -w R_ij
            L[3 * a : 3 * a + 3, 3 * a : 3 * a + 3] += w_e * np.eye(3)
            L[3 * b : 3 * b + 3, 3 * b : 3 * b + 3] += w_e * np.eye(3)
            L[3 * a : 3 * a + 3, 3 * b : 3 * b + 3] -= w_e * Rij.T
            L[3 * b : 3 * b + 3, 3 * a : 3 * a + 3] -= w_e * Rij
        w, V = np.linalg.eigh(L)
        if round_ < irls_rounds - 1:
            # Residual per edge from the current solution, Cauchy weights.
            X = V[:, :3]
            dets = [np.linalg.det(X[3 * k : 3 * k + 3]) for k in range(m)]
            if np.median(dets) < 0:
                X = X.copy()
                X[:, 0] *= -1.0
            Rs = [_project_so3(X[3 * k : 3 * k + 3]) for k in range(m)]
            sigma = 0.2  # ~11 deg chordal scale
            for eidx, ((i, j), Rij) in enumerate(zip(edges, rel_R)):
                a, b = idx_of[i], idx_of[j]
                if a < 0 or b < 0:
                    continue
                r = np.linalg.norm(Rs[b] - Rij @ Rs[a])
                weights[eidx] = 1.0 / (1.0 + (r / sigma) ** 2)
    X = V[:, :3]  # (3m, 3): columns span the block-rotation solution
    # The blocks are R_i G for one shared mixing matrix G. If det(G) < 0,
    # per-block SO(3) projection flips the (noise-dependent!) smallest
    # singular direction inconsistently across blocks — flip one column of
    # X globally so every block determinant turns positive coherently.
    dets = [np.linalg.det(X[3 * k : 3 * k + 3]) for k in range(m)]
    if np.median(dets) < 0:
        X = X.copy()
        X[:, 0] *= -1.0
    R_out = np.tile(np.eye(3), (n, 1, 1))
    # Normalize the gauge so node 0's block is a proper rotation; then
    # every other block is projected individually.
    R0 = _project_so3(X[:3])
    for k, node in enumerate(nodes):
        R_out[node] = _project_so3(X[3 * k : 3 * k + 3]) @ R0.T
    return R_out


def average_translations(
    n: int,
    edges: Sequence[Tuple[int, int]],
    rel_t: Sequence[np.ndarray],
    R_global: np.ndarray,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Least-squares translation averaging. Returns camera centers
    (n, 3) with the gauge C[first node] = 0 and unit mean edge length."""
    if mask is None:
        mask = np.ones(n, bool)
    nodes = np.flatnonzero(mask)
    idx_of = -np.ones(n, np.int64)
    idx_of[nodes] = np.arange(len(nodes))
    m = len(nodes)
    rows = []
    rhs = []

    def cross_mat(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    scale_row = np.zeros(3 * m)
    n_used = 0
    for (i, j), t in zip(edges, rel_t):
        a, b = idx_of[i], idx_of[j]
        if a < 0 or b < 0:
            continue
        d = -R_global[j].T @ t
        nd = np.linalg.norm(d)
        if nd < 1e-9:
            continue
        d = d / nd
        X = cross_mat(d)
        row = np.zeros((3, 3 * m))
        row[:, 3 * b : 3 * b + 3] = X
        row[:, 3 * a : 3 * a + 3] = -X
        rows.append(row)
        rhs.append(np.zeros(3))
        scale_row[3 * b : 3 * b + 3] += d
        scale_row[3 * a : 3 * a + 3] -= d
        n_used += 1
    # gauge: C of the first node = 0 (weighted hard-ish)
    g = np.zeros((3, 3 * m))
    g[:, :3] = np.eye(3) * 10.0
    rows.append(g)
    rhs.append(np.zeros(3))
    rows.append(scale_row[None, :])
    rhs.append(np.array([float(n_used)]))
    A = np.concatenate(rows)
    b = np.concatenate(rhs)
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    C_out = np.zeros((n, 3))
    for k, node in enumerate(nodes):
        C_out[node] = sol[3 * k : 3 * k + 3]
    return C_out


def pose_graph_init(
    n_images: int,
    edges: Sequence[Tuple[int, int]],
    rel_R: Sequence[np.ndarray],
    rel_t: Sequence[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full initialization. Returns (cams (n, 6) [rvec|t], has_cam mask,
    component mask)."""
    from tpu3d.core import lie

    mask = largest_component(n_images, edges)
    R = average_rotations(n_images, edges, rel_R, mask)
    C = average_translations(n_images, edges, rel_t, R, mask)
    cams = np.zeros((n_images, 6), np.float32)
    for i in range(n_images):
        if not mask[i]:
            continue
        cams[i, :3] = lie.so3_log_np(R[i])
        cams[i, 3:6] = -R[i] @ C[i]
    return cams, mask.copy(), mask
