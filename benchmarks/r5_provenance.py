"""VERDICT r4 #4: name the dense provenance factor, causally.

The cross-rec dense gap (same recipe, same name-keyed views): the
coverage-class rec (290 cams @ ~0.5-0.67 px) densifies 1.2-2.2 dB above
the accuracy-class rec (286-287 @ 0.44-0.45 px). This script measures the
two candidate causal factors per TEST view on the actual run pairs:

1. TRAIN-VIEW COVERAGE: how many registered train cameras sit within a
   baseline-distance neighborhood of each test camera (supervision
   density for the voxels that view renders);
2. POSE QUALITY: the test camera's own sparse reprojection error and the
   mean error of its neighborhood.

Usage: python benchmarks/r5_provenance.py recA recB  (artifact dirs;
compares the per-view factors of both recs against their measured
per-view PSNRs pulled from the logs by hand or passed inline).
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu3d.core import lie
from tpu3d.dense.eval import split_views_by_name


def load_rec(d):
    z = np.load(f"{d}/reconstruction.npz")
    meta = json.load(open(f"{d}/reconstruction_meta.json"))
    return z, meta


def centers(cams):
    C = []
    for c in cams:
        R = lie.so3_exp_np(np.asarray(c[:3], np.float64))
        C.append(-R.T @ c[3:6])
    return np.asarray(C)


def analyze(d, holdout_every=8):
    z, meta = load_rec(d)
    names = meta["registered_names"]
    cams = z["cams"]
    train_idx, test_idx = split_views_by_name(names, holdout_every)
    C = centers(cams)
    # Scene scale reference: median consecutive-camera baseline.
    order = np.argsort([int("".join(ch for ch in n if ch.isdigit()) or 0)
                        for n in names])
    steps = np.linalg.norm(np.diff(C[order], axis=0), axis=1)
    b = float(np.median(steps))
    pc = meta.get("per_camera_reproj_px") or {}
    rows = []
    for t in test_idx:
        d_all = np.linalg.norm(C[train_idx] - C[t], axis=1)
        rows.append({
            "view": names[t],
            "train_within_2b": int((d_all < 2 * b).sum()),
            "train_within_5b": int((d_all < 5 * b).sum()),
            "nearest_train_b": round(float(d_all.min() / b), 2),
            "own_reproj_px": round(pc.get(names[t], float("nan")), 3),
            "nbr_reproj_px": round(float(np.mean(
                [pc.get(names[train_idx[k]], np.nan)
                 for k in np.argsort(d_all)[:6]])), 3),
        })
    return {"dir": d, "n_reg": len(names), "median_baseline": b,
            "mean_reproj": meta.get("mean_reproj_px"),
            "n_train": len(train_idx), "n_test": len(test_idx),
            "per_view": rows}


if __name__ == "__main__":
    for d in sys.argv[1:]:
        r = analyze(d)
        print(json.dumps(r, indent=None))
