"""Top-down trajectory plots for reconstruction artifacts.

Usage: python benchmarks/plot_trajectories.py out.png dir1 [dir2 ...]
Each dir must hold reconstruction.npz (+ reconstruction_meta.json).
Draws camera centers in capture order (the dataset is a sequential
walk-around, so a coherent reconstruction draws a loop; teleport islands
show as long chords).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def centers(path):
    from tpu3d.core import lie

    z = np.load(os.path.join(path, "reconstruction.npz"))
    order = np.argsort(z["registered"])
    cams = z["cams"][order]
    C = np.stack([-lie.so3_exp_np(c[:3]).T @ c[3:] for c in cams])
    meta = json.load(open(os.path.join(path, "reconstruction_meta.json")))
    return C, z["registered"][order], meta


def main(out, *dirs):
    n = len(dirs)
    fig, axes = plt.subplots(1, n, figsize=(5.2 * n, 5))
    if n == 1:
        axes = [axes]
    for ax, d in zip(axes, dirs):
        C, reg, meta = centers(d)
        # robust center/scale + PCA onto the dominant motion plane so a
        # handful of teleported cameras can't squash the main loop
        med = np.median(C, axis=0)
        C0 = C - med
        r = np.linalg.norm(C0, axis=1)
        keep = r <= 4.0 * np.median(r) + 1e-9
        U, S, Vt = np.linalg.svd(C0[keep] - C0[keep].mean(0), full_matrices=False)
        P = C0 @ Vt[:2].T
        s = np.percentile(np.abs(P[keep]), 98) + 1e-9
        P = np.clip(P / s, -2.5, 2.5)
        ax.plot(P[:, 0], P[:, 1], "-", lw=0.7, color="#999")
        sc = ax.scatter(P[:, 0], P[:, 1], c=reg, cmap="viridis", s=14)
        n_out = int((~keep).sum())
        ax.set_title(f"{os.path.basename(d.rstrip('/'))}: "
                     f"{len(reg)} cams, {meta.get('mean_reproj_px', 0):.3f}px"
                     + (f" ({n_out} outliers clipped)" if n_out else ""))
        ax.set_aspect("equal")
        ax.set_xlabel("pc1")
        ax.set_ylabel("pc2")
    fig.colorbar(sc, ax=axes, label="image index", shrink=0.8)
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
