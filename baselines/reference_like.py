"""Reference-equivalent CPU baseline pipeline.

The reference's learned front-end (DISK + LightGlue) requires pretrained
checkpoints that cannot be downloaded in this environment, so the reference
pipeline cannot run as-is. This harness reproduces its algorithmic path
with the same third-party libraries it delegates to (SURVEY §2.2) in the
"SIFT baseline" configuration named by BASELINE.json configs[0]:

  stage 1: cv2 SIFT keypoints+descriptors (<=2048/image), centered coords
           (feature_extraction.py:34 convention)
  stage 2: BF ratio-test matching over a sequential+retrieval pair order
  stage 3: cv2.findEssentialMat RANSAC -> recoverPose / solvePnPRansac ->
           cv2.triangulatePoints -> scipy least_squares per-pair BA
           (sfm.py:26-131 semantics, including the jac_sparsity pattern)

Usage: python baselines/reference_like.py [n_images] [downscale]
Prints one JSON line with wall-clock per stage + quality stats.
"""
from __future__ import annotations

import json
import os
import sys
import time

import cv2
import numpy as np
from scipy.optimize import least_squares
from scipy.sparse import lil_matrix

DATASET = "/root/reference/ystad_kloster"
FOCAL_FULL = 2378.98305085


def extract(names, downscale):
    sift = cv2.SIFT_create(nfeatures=2048)
    kps, descs, sizes = [], [], []
    for n in names:
        img = cv2.imread(os.path.join(DATASET, n), cv2.IMREAD_GRAYSCALE)
        if downscale > 1:
            img = cv2.resize(img, (img.shape[1] // downscale, img.shape[0] // downscale))
        kp, d = sift.detectAndCompute(img, None)
        h, w = img.shape
        pts = np.array([[k.pt[0] - w / 2, -(k.pt[1] - h / 2)] for k in kp], np.float32)
        kps.append(pts)
        descs.append(d)
        sizes.append((w, h))
    return kps, descs, sizes


def ba_sparse(len_point, len_x, y=6):
    A = lil_matrix((len_point * 2, len_x), dtype=int)
    A[np.arange(len_point * 2), :y] = 1
    for i in range(3):
        A[np.arange(len_point) * 2, y + np.arange(len_point) * 3 + i] = 1
        A[np.arange(len_point) * 2 + 1, y + np.arange(len_point) * 3 + i] = 1
    return A


def reproj_err(x, K, pts2d):
    R, t, X = x[:3], x[3:6], x[6:].reshape((len(pts2d), 3))
    proj, _ = cv2.projectPoints(X, R, t, K, distCoeffs=None)
    return (pts2d - proj[:, 0, :]).ravel()


def run(n_images=24, downscale=2):
    names = sorted(
        f for f in os.listdir(DATASET) if f.lower().endswith(".jpg")
    )[:n_images]
    focal = FOCAL_FULL / downscale
    K = np.array([[focal, 0, 0], [0, focal, 0], [0, 0, 1]])

    t0 = time.time()
    kps, descs, sizes = extract(names, downscale)
    t_extract = time.time() - t0

    # Sequential chain matching (the BFS spanning tree of a photo sequence).
    t0 = time.time()
    bf = cv2.BFMatcher(cv2.NORM_L2)
    pair_matches = []
    for i in range(len(names) - 1):
        mm = bf.knnMatch(descs[i], descs[i + 1], k=2)
        good = [m for m, n in mm if m.distance < 0.8 * n.distance]
        idx0 = np.array([m.queryIdx for m in good])
        idx1 = np.array([m.trainIdx for m in good])
        pair_matches.append((i, i + 1, idx0, idx1))
    t_match = time.time() - t0

    # Incremental SfM (sfm.py semantics).
    t0 = time.time()
    cameras = [None] * len(names)
    track_of = [dict() for _ in names]  # kpt idx -> track id
    points3d = {}
    next_track = 0
    all_errs = []
    n_registered = 0
    for pi, (i, j, idx0, idx1) in enumerate(pair_matches):
        if len(idx0) < 8:
            continue
        pts0 = kps[i][idx0].astype(np.float64)
        pts1 = kps[j][idx1].astype(np.float64)
        E, mask = cv2.findEssentialMat(pts0, pts1, K, method=cv2.RANSAC, prob=0.999, threshold=1)
        if E is None or mask is None:
            continue
        sel = mask.ravel() == 1
        idx0s, idx1s, p0, p1 = idx0[sel], idx1[sel], pts0[sel], pts1[sel]
        if len(p0) < 8:
            continue
        known_tracks = np.array([track_of[i].get(k, -1) for k in idx0s])
        known = np.array([t >= 0 and t in points3d for t in known_tracks])
        if pi == 0 or cameras[i] is None:
            _, R, t, _ = cv2.recoverPose(E, p0, p1, K)
            cameras[i] = np.hstack([np.eye(3), np.zeros((3, 1))])
        else:
            if known.sum() < 6:
                continue
            obj = np.stack([points3d[t] for t in known_tracks[known]])
            ok, rvec, t, _ = cv2.solvePnPRansac(obj, p1[known], K, np.zeros((5, 1), np.float32), flags=cv2.SOLVEPNP_ITERATIVE)
            if not ok:
                continue
            R, _ = cv2.Rodrigues(rvec)
        cameras[j] = np.hstack([R, t.reshape(3, 1)])
        n_registered += 1

        # triangulate new points
        new = ~known
        if new.sum() > 0:
            X = cv2.triangulatePoints(K @ cameras[i], K @ cameras[j], p0[new].T, p1[new].T)
            X = (X[:3] / X[3]).T
            new_ids = []
            for w_, k0, k1 in zip(X, idx0s[new], idx1s[new]):
                tid = next_track
                next_track += 1
                points3d[tid] = w_
                track_of[i][k0] = tid
                track_of[j][k1] = tid
                new_ids.append(tid)
            # per-pair BA (sfm.py:36-50): camera j + new points, scipy LM
            x = np.hstack([cv2.Rodrigues(cameras[j][:3, :3])[0].ravel(), cameras[j][:3, 3].ravel(),
                           X.ravel()])
            A = ba_sparse(len(X), len(x), 6)
            res = least_squares(reproj_err, x, jac_sparsity=A, x_scale="jac", ftol=1e-8,
                                args=(K, p1[new]))
            Rn = cv2.Rodrigues(res.x[:3])[0]
            cameras[j] = np.hstack([Rn, res.x[3:6].reshape(3, 1)])
            Xn = res.x[6:].reshape(-1, 3)
            for tid, w_ in zip(new_ids, Xn):
                points3d[tid] = w_
        for tt, k1 in zip(known_tracks[known], idx1s[known]):
            track_of[j][k1] = tt
    t_sfm = time.time() - t0

    # final reprojection stats over all observations
    errs = []
    for img, tmap in enumerate(track_of):
        if cameras[img] is None:
            continue
        ids = [(k, t) for k, t in tmap.items() if t in points3d]
        if not ids:
            continue
        X = np.stack([points3d[t] for _, t in ids])
        obs = kps[img][[k for k, _ in ids]]
        rvec = cv2.Rodrigues(cameras[img][:3, :3])[0]
        proj, _ = cv2.projectPoints(X, rvec, cameras[img][:3, 3], K, None)
        errs.append(np.linalg.norm(proj[:, 0, :] - obs, axis=1))
    errs = np.concatenate(errs) if errs else np.array([np.nan])

    # Persist the trajectory + names for ATE comparison
    # (benchmarks/compare_trajectories.py).
    reg_idx = [i for i, c in enumerate(cameras) if c is not None]
    np.savez(
        "/tmp/reference_like_cams.npz",
        names=np.array([names[i] for i in reg_idx]),
        extrinsics=np.stack([cameras[i] for i in reg_idx]).astype(np.float64),
    )

    out = {
        "n_images": n_images,
        "downscale": downscale,
        "t_extract": round(t_extract, 2),
        "t_match": round(t_match, 2),
        "t_sfm": round(t_sfm, 2),
        "t_total": round(t_extract + t_match + t_sfm, 2),
        "registered": int(sum(c is not None for c in cameras)),
        "points": len(points3d),
        "mean_reproj_px": float(np.nanmean(errs)),
        "median_reproj_px": float(np.nanmedian(errs)),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    run(n, ds)
