"""Full-dataset driver: extract + match ONCE (device-heavy), then run both
reconstruction modes (incremental chain vs global pose-graph) from the same
saved matches and report quality + trajectory-coherence stats side by side.

One long-lived process on purpose: the shared TPU pool charges multi-minute
claim stalls per process (ROUND1_NOTES.md), so every stage runs in here.

Usage: python scripts/full_run.py [--limit N] [--downscale 2]
       [--artifacts artifacts/full290] [--modes global,incremental]
       [--skip-extract-if-cached]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def trajectory_stats(cams: np.ndarray, registered: np.ndarray) -> dict:
    """Coherence of the camera-center walk in image-index order. The
    dataset is a sequential capture: a teleporting step means a
    wrongly-scaled or misplaced camera (BASELINE.md trajectory analysis)."""
    order = np.argsort(registered)
    R = np.stack([_so3_exp(c[:3]) for c in cams[order]])
    t = cams[order][:, 3:6]
    C = -np.einsum("nji,nj->ni", R, t)
    steps = np.linalg.norm(np.diff(C, axis=0), axis=1)
    if len(steps) == 0:
        return {}
    med = float(np.median(steps))
    return {
        "median_step": med,
        "p90_step_rel": float(np.percentile(steps, 90) / max(med, 1e-12)),
        "max_step_rel": float(steps.max() / max(med, 1e-12)),
    }


def _so3_exp(w):
    from tpu3d.core import lie

    return lie.so3_exp_np(np.asarray(w, np.float64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/ystad_kloster")
    ap.add_argument("--artifacts", default="artifacts/full290")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--focal", type=float, default=2378.98305085)
    ap.add_argument("--modes", default="global,incremental")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize overrides JAX_PLATFORMS)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu3d.config import CameraConfig, PipelineConfig, SfMConfig
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.io.images import list_images
    from tpu3d.io.matches import load_matches, save_matches
    from tpu3d.io.ply import write_ply
    from tpu3d.sfm.pipeline import (
        ExtractedFeatures, run_extraction, run_global_reconstruction,
        run_matching, run_reconstruction, run_retrieval,
    )

    focal = args.focal / args.downscale
    cam = CameraConfig(focal_length=focal)
    cfg = PipelineConfig(camera=cam, sfm=SfMConfig(camera=cam))
    store = ArtifactStore(args.artifacts)
    os.makedirs(args.artifacts, exist_ok=True)
    verbose = not args.quiet

    names = list_images(args.images)
    if args.limit:
        names = names[: args.limit]

    # ---- stage 1: features (cached) ----
    t0 = time.time()
    data = store.load("features")
    meta = store.load_json("features_meta")
    if data is not None and meta and meta.get("names") == list(names) \
            and meta.get("downscale") == args.downscale:
        import jax.numpy as jnp

        feats = ExtractedFeatures(
            names=meta["names"], keypoints=data["keypoints"],
            keypoints_px=data["keypoints_px"], valid=data["valid"],
            colors_bgr=data["colors_bgr"], image_size=data["image_size"],
            descriptors_dev=jnp.asarray(data["descriptors"]),
            valid_dev=jnp.asarray(data["valid"].astype(np.float32)),
            keypoints_dev=jnp.asarray(data["keypoints"]),
        )
        print(f"[full_run] features loaded from cache ({len(names)} images)", flush=True)
    else:
        feats = run_extraction(args.images, cfg, names, args.downscale, verbose)
        store.save("features", keypoints=feats.keypoints, keypoints_px=feats.keypoints_px,
                   descriptors=feats.descriptors, valid=feats.valid,
                   colors_bgr=feats.colors_bgr, image_size=feats.image_size)
        store.save_json("features_meta", {"names": feats.names, "downscale": args.downscale,
                                          "seconds": time.time() - t0})
    t_extract = time.time() - t0

    # ---- stage 2: retrieval + matching (cached) ----
    t0 = time.time()
    loaded = load_matches(args.artifacts, len(names), feats.keypoints.shape[1],
                          cfg.sfm.max_tracks)
    if loaded is not None:
        regs, ts, adj = loaded
        print(f"[full_run] matches loaded from cache ({len(regs)} regs)", flush=True)
    else:
        adj = run_retrieval(feats, cfg)
        regs, ts = run_matching(feats, adj, cfg, verbose=verbose)
        save_matches(args.artifacts, regs, ts, adj, time.time() - t0)
    t_match = time.time() - t0

    # ---- stage 3: reconstruction per mode ----
    results = {}
    for mode in args.modes.split(","):
        mode = mode.strip()
        t0 = time.time()
        # Fresh copies: both modes mutate edge.track in place via resolve
        # (idempotent) but the engines must not share state.
        sub = load_matches(args.artifacts, len(names), feats.keypoints.shape[1],
                           cfg.sfm.max_tracks)
        regs_m, ts_m, adj_m = sub
        if mode == "global":
            rec = run_global_reconstruction(feats, regs_m, ts_m, cfg, verbose=verbose, adj=adj_m)
        else:
            rec = run_reconstruction(feats, regs_m, ts_m, cfg, verbose=verbose, adj=adj_m)
        dt = time.time() - t0
        out = ArtifactStore(os.path.join(args.artifacts, mode))
        out.save("reconstruction", cams=rec.cams, registered=rec.registered,
                 points=rec.points, colors_bgr=rec.colors_bgr,
                 track_ids=rec.track_ids, extrinsics=rec.extrinsics())
        stats = trajectory_stats(rec.cams, rec.registered)
        summary = {
            "mode": mode, "registered": int(len(rec.registered)),
            "points": int(len(rec.points)),
            "mean_reproj_px": rec.mean_reproj_px, "num_obs": rec.num_obs,
            "seconds": round(dt, 1), **stats,
        }
        out.save_json("reconstruction_meta", {
            **summary, "registered_names": rec.registered_names(),
            "downscale": args.downscale,
        })
        write_ply(os.path.join(args.artifacts, mode, "result.ply"),
                  rec.points, rec.colors_bgr)
        results[mode] = summary
        print(f"[full_run] {json.dumps(summary)}", flush=True)

    print(json.dumps({
        "extract_s": round(t_extract, 1), "match_s": round(t_match, 1),
        "results": results,
    }))


if __name__ == "__main__":
    main()
