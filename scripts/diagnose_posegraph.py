"""Offline pose-graph diagnostics from saved matching artifacts.

Measures, per edge: (a) rotation consistency — geodesic angle between the
averaged relative rotation R_j R_iᵀ and the measured rel_R; (b) center
consistency — angle between (C_j − C_i) and the measured world baseline
direction. Separates "rotation averaging failed" from "translation
averaging failed" without any device work.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(art="artifacts/full290"):
    from tpu3d.io.matches import load_matches
    from tpu3d.sfm.posegraph import (
        average_rotations, average_translations, largest_component,
    )

    meta = json.load(open(os.path.join(art, "features_meta.json")))
    n = len(meta["names"])
    regs, ts, adj = load_matches(art, n, 2048, 400_000)
    edges, rel_R, rel_t, sizes = [], [], [], []
    for reg in regs:
        for e in reg.edges:
            if e.rel_R is not None:
                edges.append((e.ref_img, reg.img))
                rel_R.append(np.asarray(e.rel_R, np.float64))
                rel_t.append(np.asarray(e.rel_t, np.float64))
                sizes.append(len(e.idx_new))
    print(f"{len(edges)} edges over {n} images")
    mask = largest_component(n, edges)
    print(f"largest component: {int(mask.sum())}")

    R = average_rotations(n, edges, rel_R, mask)
    rot_err = []
    for (i, j), Rij in zip(edges, rel_R):
        if not (mask[i] and mask[j]):
            continue
        Rpred = R[j] @ R[i].T
        c = np.clip((np.trace(Rpred @ Rij.T) - 1) / 2, -1, 1)
        rot_err.append(np.degrees(np.arccos(c)))
    rot_err = np.array(rot_err)
    print(f"rotation edge error deg: med {np.median(rot_err):.2f} "
          f"p90 {np.percentile(rot_err, 90):.2f} max {rot_err.max():.1f} "
          f"frac>10deg {np.mean(rot_err > 10):.2%}")

    C = average_translations(n, edges, rel_t, R, mask)
    dir_err = []
    for (i, j), t in zip(edges, rel_t):
        if not (mask[i] and mask[j]):
            continue
        d = -R[j].T @ t
        nd = np.linalg.norm(d)
        b = C[j] - C[i]
        nb = np.linalg.norm(b)
        if nd < 1e-9 or nb < 1e-9:
            dir_err.append(180.0)
            continue
        dir_err.append(np.degrees(np.arccos(np.clip(d @ b / nd / nb, -1, 1))))
    dir_err = np.array(dir_err)
    print(f"baseline direction error deg: med {np.median(dir_err):.2f} "
          f"p90 {np.percentile(dir_err, 90):.2f} frac>30deg {np.mean(dir_err > 30):.2%}")
    # center spread sanity: are the cameras collapsed?
    Cm = C[mask]
    print(f"center spread: std {Cm.std(0)} pairwise-median "
          f"{np.median(np.linalg.norm(Cm - Cm.mean(0), axis=1)):.3f}")
    steps = np.linalg.norm(np.diff(Cm[np.argsort(np.flatnonzero(mask))], axis=0), axis=1)
    print(f"consecutive steps: med {np.median(steps):.4f} max {steps.max():.2f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
