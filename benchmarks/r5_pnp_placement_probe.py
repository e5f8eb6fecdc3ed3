"""Bench-shape placement A/B for the register path (VERDICT r4 #5).

The 24-image bench's reconstruct wall is dominated by pnp 0.77-0.91 s of
host-CPU compute (3 chunks + bootstrap on a 2-core box) under the hybrid
backend. This probe runs the bench pipeline with backend="tpu" (register
chunks on the device, ~27 ms RTT each) vs the default hybrid, comparing
quality AND the pnp/reconstruct walls. Run on the real chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np

import bench as B
from tpu3d.io.images import list_images
from tpu3d.sfm import pipeline as P


def run(backend):
    cfg = B.bench_config()
    cfg = dataclasses.replace(cfg, sfm=dataclasses.replace(cfg.sfm, backend=backend))
    names = list_images(B.DATASET)[: B.N_IMAGES]
    # cold pass (compiles), then steady pass
    rec, _ = P.reconstruct(B.DATASET, cfg, names=names, downscale=B.DOWNSCALE, verbose=False)
    t0 = time.time()
    rec, timings = P.reconstruct(B.DATASET, cfg, names=names, downscale=B.DOWNSCALE, verbose=False)
    total = time.time() - t0
    return {
        "backend": backend,
        "total_s": round(total, 2),
        "stage_seconds": {k: round(v, 2) for k, v in timings.items()},
        "sfm_phases": {k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in P.LAST_SFM_TIMERS.items()},
        "registered": len(rec.registered),
        "mean_reproj_px": round(float(rec.mean_reproj_px), 4),
        "points": int(len(rec.points)),
    }


if __name__ == "__main__":
    for backend in (sys.argv[1:] or ["hybrid", "tpu"]):
        print(json.dumps(run(backend)), flush=True)
