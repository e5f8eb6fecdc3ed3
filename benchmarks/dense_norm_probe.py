"""Grid-utilization audit of the dense scene normalization.

The dense stage normalizes the sparse cloud into [-1,1]^3 using the
reference's mean+300-after-x200 outlier filter — thresholds that are
ABSOLUTE while an SfM gauge is arbitrary. Round-2 measured a 3.3 dB
PSNR collapse when a differently-gauged reconstruction of the SAME
matches normalized its content into ~13% of the voxel volume
(ROUND2_NOTES "Dense normalization is NOT gauge-invariant").

This probe reports, for a saved reconstruction:
  - the current (mean+300) normalization: kept fraction, content
    occupancy of [-1,1]^3 (fraction of voxels with a kept point within
    1.5 voxel radii at 64^3), depth-band percentiles;
  - the same stats under a scale-invariant percentile normalization
    (extent = margin * p98 of dist from the median center);
  - the stats again after rescaling the gauge x0.2/x5 — a
    gauge-invariant scheme must produce identical rows.

Usage: python benchmarks/dense_norm_probe.py --artifacts artifacts/full290c
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def occupancy(points_n: np.ndarray, res: int = 64) -> float:
    """Fraction of res^3 voxels of [-1,1]^3 containing a point."""
    inside = np.all(np.abs(points_n) <= 1.0, axis=1)
    p = points_n[inside]
    if not len(p):
        return 0.0
    idx = np.clip(((p + 1.0) * 0.5 * res).astype(np.int64), 0, res - 1)
    flat = (idx[:, 0] * res + idx[:, 1]) * res + idx[:, 2]
    return len(np.unique(flat)) / float(res**3)


def mean300_norm(points):
    # Pinned to the legacy body: this probe's label ("mean+300") and its
    # recorded numbers describe the old absolute-filter semantics, which
    # moved to normalize_scene_legacy in r3 (ADVICE r3).
    from tpu3d.dense.train import normalize_scene_legacy

    n = normalize_scene_legacy(points)
    return n.apply(points), f"mean+300 (extent {n.scale:.1f})"


def percentile_norm(points, q=98.0, margin=1.25):
    center = np.median(points, axis=0)
    dist = np.linalg.norm(points - center, axis=1)
    extent = margin * np.percentile(dist, q)
    return (points - center) / extent, f"p{q:.0f}x{margin} (extent {extent:.1f})"


def report(points, scheme, tag):
    pn, desc = scheme(points)
    inside = np.all(np.abs(pn) <= 1.0, axis=1)
    occ = occupancy(pn)
    dist = np.linalg.norm(pn, axis=1)
    print(f"  [{tag}] {desc}: inside {inside.mean():.3f}  occ64 {occ * 100:.2f}%"
          f"  dist p50/p90 {np.percentile(dist, 50):.2f}/{np.percentile(dist, 90):.2f}")
    return occ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts/full290c")
    args = ap.parse_args()
    d = np.load(os.path.join(args.artifacts, "reconstruction.npz"))
    pts = d["points"]
    print(f"{len(pts)} points from {args.artifacts}")
    for gauge in (1.0, 0.2, 5.0):
        print(f"gauge x{gauge}:")
        report(pts * gauge, mean300_norm, "mean300")
        report(pts * gauge, percentile_norm, "pctl")


if __name__ == "__main__":
    main()
