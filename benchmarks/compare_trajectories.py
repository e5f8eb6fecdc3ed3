"""ATE comparison: tpu3d trajectory vs the reference-equivalent pipeline.

Monocular SfM is gauge-free, so both trajectories are aligned by a
similarity transform (Umeyama) over the commonly registered cameras before
computing absolute trajectory error — the standard ATE protocol. The north
star asks that tpu3d match the reference's trajectory within its own error
bound; since ground truth doesn't exist for ystad_kloster, the relevant
statistic is the inter-method ATE relative to the trajectory scale.

Usage:
  python baselines/reference_like.py 290 2          # writes /tmp/reference_like_cams.npz
  python benchmarks/compare_trajectories.py [artifacts_dir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def camera_centers(extrinsics: np.ndarray) -> np.ndarray:
    """(M, 3, 4) world->cam [R|t] -> (M, 3) centers C = -R^T t."""
    R = extrinsics[:, :, :3]
    t = extrinsics[:, :, 3]
    return -np.einsum("nji,nj->ni", R, t)


def umeyama(A: np.ndarray, B: np.ndarray):
    """Similarity transform (s, R, t) minimizing ||sRA + t - B||."""
    muA, muB = A.mean(0), B.mean(0)
    A0, B0 = A - muA, B - muB
    U, S, Vt = np.linalg.svd(A0.T @ B0 / len(A))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = (U @ D @ Vt).T
    varA = (A0**2).sum() / len(A)
    s = np.trace(np.diag(S) @ D) / varA
    t = muB - s * R @ muA
    return s, R, t


def main(art_dir="artifacts_full", ref_path="/tmp/reference_like_cams.npz"):
    from tpu3d.io.artifacts import ArtifactStore

    store = ArtifactStore(art_dir)
    rec = store.load("reconstruction")
    meta = store.load_json("reconstruction_meta")
    ref = np.load(ref_path, allow_pickle=True)

    ours_names = meta["registered_names"]
    ref_names = [str(n) for n in ref["names"]]
    common = sorted(set(ours_names) & set(ref_names))
    oi = {n: i for i, n in enumerate(ours_names)}
    ri = {n: i for i, n in enumerate(ref_names)}

    C_ours = camera_centers(rec["extrinsics"])[[oi[n] for n in common]]
    C_ref = camera_centers(np.asarray(ref["extrinsics"], np.float64))[[ri[n] for n in common]]

    s, R, t = umeyama(C_ours, C_ref)
    aligned = (s * (R @ C_ours.T)).T + t
    err = np.linalg.norm(aligned - C_ref, axis=1)
    scale = np.linalg.norm(C_ref - C_ref.mean(0), axis=1).mean()

    # Windowed ATE: per-window similarity alignment removes each method's
    # GLOBAL drift and measures local trajectory agreement. A small
    # windowed ATE with a large global ATE means the disagreement is
    # low-frequency drift in one (or both) trajectories — which the
    # reprojection statistics then attribute (ours: 0.75px over 122k obs;
    # reference-like: 8.78px mean with unbounded tail).
    W = 15
    win_rel = []
    for a in range(0, len(common) - W, W // 2):
        A = C_ours[a : a + W]
        B = C_ref[a : a + W]
        bscale = np.linalg.norm(B - B.mean(0), axis=1).mean()
        if bscale < 1e-9:
            continue
        sw, Rw, tw = umeyama(A, B)
        e = np.linalg.norm((sw * (Rw @ A.T)).T + tw - B, axis=1)
        win_rel.append(float(np.sqrt((e**2).mean()) / bscale))
    out = {
        "common_cameras": len(common),
        "ours_registered": len(ours_names),
        "ref_registered": len(ref_names),
        "ate_rmse": float(np.sqrt((err**2).mean())),
        "ate_mean": float(err.mean()),
        "ate_median": float(np.median(err)),
        "trajectory_scale": float(scale),
        "ate_rmse_relative": float(np.sqrt((err**2).mean()) / scale),
        "windowed_ate_relative_median": float(np.median(win_rel)) if win_rel else None,
        "windowed_ate_relative_p90": float(np.percentile(win_rel, 90)) if win_rel else None,
        "windows": len(win_rel),
    }
    store.save_json("ate_report", out)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "artifacts_full")
