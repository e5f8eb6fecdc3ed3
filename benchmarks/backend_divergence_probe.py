"""Quantify CPU-vs-TPU divergence of the reconstruct-phase estimators on
real pair data.

Loads saved features + matches, reconstructs nothing — just pushes the
same real inputs through find_essential_ransac / pnp_ransac /
triangulate_points on the active backend and prints inlier counts and
pose/point agreement stats, so two runs (one --cpu, one TPU) can be
diffed to find which component's backend gap regressed.

Usage:
  python benchmarks/backend_divergence_probe.py --artifacts artifacts/full290 [--cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts/full290")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.geometry.estimators import find_essential_ransac
    from tpu3d.geometry.pnp import pnp_ransac
    from tpu3d.io.matches import load_matches

    z = np.load(os.path.join(args.artifacts, "features.npz"))
    kp = z["keypoints"]
    meta = json.load(open(os.path.join(args.artifacts, "features_meta.json")))
    focal = 2378.98305085 / meta.get("downscale", 2)

    K = kp.shape[1]
    n_img = kp.shape[0]
    loaded = load_matches(args.artifacts, n_img, K, 400000)
    if loaded is None:
        print("no saved matches — run `match` first", file=sys.stderr)
        sys.exit(1)
    regs = loaded[0]
    # Take the first N accepted primary edges with >=200 correspondences.
    rows = []
    CAP = 2048
    for reg in regs:
        e = reg.edges[0]
        m = min(len(e.idx_new), CAP)
        if m < 200:
            continue
        uv0 = np.zeros((CAP, 2), np.float32)
        uv1 = np.zeros((CAP, 2), np.float32)
        uv0[:m] = e.uv_ref[:CAP]
        uv1[:m] = e.uv_new[:CAP]
        v = (np.arange(CAP) < m).astype(np.float32)
        rows.append((reg.img, e.ref_img, uv0, uv1, v, m))
        if len(rows) >= args.pairs:
            break

    key = jax.random.PRNGKey(7)
    report = {"backend": jax.default_backend(), "essential": [], "pnp": []}
    for img, ref, uv0, uv1, v, m in rows:
        key, k1 = jax.random.split(key)
        er = find_essential_ransac(k1, jnp.asarray(uv0), jnp.asarray(uv1),
                                   jnp.asarray(v), focal,
                                   threshold_px=1.0, num_hypotheses=512)
        n_in = int(er.num_inliers)
        n_front = int(np.asarray(er.front).sum())
        rvec = np.asarray(er.R)
        report["essential"].append(
            {"pair": [int(ref), int(img)], "m": m, "inliers": n_in,
             "front": n_front, "R0": [round(float(x), 6) for x in rvec[0]],
             "t": [round(float(x), 6) for x in np.asarray(er.t)]})

    # Synthetic-but-realistic PnP: use each pair's E-pose to triangulate a
    # fake depth-1 cloud and re-solve PnP; counts expose sampling/polish
    # divergence without needing a reconstruction.
    rng = np.random.default_rng(0)
    for trial, (img, ref, uv0, uv1, v, m) in enumerate(rows[: max(4, args.pairs // 4)]):
        n = 512
        X = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        X[:, 2] += 4.0
        rv = rng.normal(0, 0.3, 3).astype(np.float32)
        tv = np.array([0.1, -0.2, 0.3], np.float32)
        from tpu3d.core.lie import so3_exp as exp_so3

        R = np.asarray(exp_so3(jnp.asarray(rv)))
        Xc = X @ R.T + tv
        uv = (Xc[:, :2] / Xc[:, 2:3]) * focal
        uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
        out = int(n * 0.3)
        uv[:out] += rng.uniform(-80, 80, (out, 2)).astype(np.float32)
        key, k2 = jax.random.split(key)
        Rr, tr, inl, n_inl = pnp_ransac(k2, jnp.asarray(X), jnp.asarray(uv / focal),
                                 jnp.asarray(np.ones(n, np.float32)),
                                 (1.0 / focal) ** 2,
                                 num_hypotheses=256)
        ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(Rr) @ R.T) - 1) / 2, -1, 1)))
        # synthetic points/poses — label by trial, not the unrelated pair ids
        report["pnp"].append({"trial": trial,
                              "inliers": int(n_inl),
                              "rot_err_deg": round(float(ang), 4),
                              "t_err": round(float(np.linalg.norm(np.asarray(tr) - tv)), 5)})

    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
