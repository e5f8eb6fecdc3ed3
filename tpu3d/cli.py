"""Command-line interface.

The reference is driven by editing constants in four separate scripts and
running them in order (README.md:21-27). Here one CLI drives every stage
with a shared config, and stages checkpoint/restore through the artifact
store so any stage can be re-run from the previous stage's outputs (the
reference's `output/*.npy` workflow, SURVEY §1, but typed and compressed).

  python -m tpu3d.cli extract    --images DIR [--downscale N]
  python -m tpu3d.cli match      --images DIR
  python -m tpu3d.cli reconstruct --images DIR [--ply out.ply]
  python -m tpu3d.cli densify    --images DIR [--epochs N]
  python -m tpu3d.cli full       --images DIR [--ply out.ply]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _build_config(args):
    from tpu3d.config import (
        BAConfig, CameraConfig, DenseConfig, FrontendConfig, MatchingConfig,
        PipelineConfig, RansacConfig, SfMConfig,
    )

    focal = args.focal / args.downscale
    return PipelineConfig(
        camera=CameraConfig(focal_length=focal),
        frontend=FrontendConfig(max_keypoints=args.max_keypoints,
                                model=getattr(args, "frontend", "classical"),
                                weights=getattr(args, "frontend_weights", "")),
        matching=MatchingConfig(min_raw_matches=args.min_raw_matches,
                                matcher=getattr(args, "matcher", "mnn"),
                                weights=getattr(args, "matcher_weights", "")),
        sfm=SfMConfig(
            camera=CameraConfig(focal_length=focal),
            max_tracks=args.max_tracks,
            ransac=RansacConfig(num_hypotheses=args.ransac_hypotheses,
                                use_five_point=getattr(args, "five_point", True)),
            global_ba_every=args.global_ba_every,
            global_ba_growth=getattr(args, "global_ba_growth", 1.12),
            local_window=getattr(args, "local_window", 25),
            register_batch=getattr(args, "register_batch", 8),
            backend=getattr(args, "sfm_backend", "auto"),
            register_all=getattr(args, "register_all", False),
            ba=BAConfig(midrun_refit=not getattr(args, "no_midrun_refit",
                                                 False)),
        ),
        dense=DenseConfig(epochs=args.epochs,
                          grid_resolution=getattr(args, "grid_resolution", 256),
                          num_samples=getattr(args, "num_samples", 192),
                          hierarchical=getattr(args, "hierarchical", False),
                          scene_scale=_resolve_scene_scale(args),
                          optimizer=getattr(args, "dense_optimizer", "adam")),
        image_dir=args.images,
        artifact_dir=args.artifacts,
    )


def _resolve_scene_scale(args) -> float:
    """0 = auto: 1.0 under the gauge-invariant coremax/core normalizations
    (their extents put all kept content inside the unit box — the
    reference's 1.5 margin then wastes 1/3 of linear voxel resolution,
    measured as ~3 dB); 1.5 for legacy/rays-pkl (reference semantics)."""
    s = getattr(args, "scene_scale", 0.0)
    if s and s > 0:
        return s
    if getattr(args, "norm", "coremax") in ("coremax", "core") and \
            not getattr(args, "rays_pkl", ""):
        return 1.0
    return 1.5


def _gate_fingerprint(cfg):
    """The knobs the match+gate block's packed rows depend on. Prematch
    results are only reusable under the SAME gating config — silently
    mixing e.g. extract-time 128-hypothesis rows with a 512-hypothesis
    match run would gate sequential edges differently from retrieval
    edges."""
    import zlib

    # Matcher identity matters as much as the gate knobs: an mnn-computed
    # memo consumed by a `match --matcher lightglue` run would silently mix
    # match sources across edges of one view graph (ADVICE r3, medium).
    matcher_id = cfg.matching.matcher
    if cfg.matching.weights:
        matcher_id += "|" + cfg.matching.weights
        try:
            st = os.stat(cfg.matching.weights)
            matcher_id += f"|{st.st_size}|{st.st_mtime_ns}"
        except OSError:
            pass
    return [float(cfg.camera.focal_length),
            float(cfg.matching.ransac_threshold_px),
            float(cfg.matching.ratio_threshold),
            float(cfg.sfm.ransac.num_hypotheses),
            1.0 if cfg.sfm.ransac.use_five_point else 0.0,
            float(zlib.crc32(matcher_id.encode()))]


def _save_prematch(artifacts, memo, cfg):
    if not memo:
        return
    import numpy as np

    edges = np.array(sorted(memo), np.int32)
    flat = np.stack([memo[tuple(e)] for e in edges])
    np.savez_compressed(os.path.join(artifacts, "prematch.npz"),
                        edges=edges, flat=flat,
                        gate=np.asarray(_gate_fingerprint(cfg), np.float64))


def _load_prematch(artifacts, cfg):
    """Prematched edge results published by a stage-overlap extract run.
    Only valid for the features AND gating config they were computed
    under — every extract run clears any stale file, and a config
    mismatch drops the memo with a warning."""
    import numpy as np

    p = os.path.join(artifacts, "prematch.npz")
    if not os.path.exists(p):
        return None
    with np.load(p) as z:
        gate = z["gate"] if "gate" in z.files else None
        memo = {tuple(e): f for e, f in zip(z["edges"], z["flat"])}
    want = np.asarray(_gate_fingerprint(cfg), np.float64)
    if gate is None or len(gate) != len(want) or not np.allclose(gate, want):
        print("prematch.npz was computed under a different gating config "
              "— ignoring it (edges will be re-gated)", file=sys.stderr)
        return None
    return memo


def _clear_prematch(artifacts):
    try:
        os.remove(os.path.join(artifacts, "prematch.npz"))
    except OSError:
        pass


def cmd_extract(args):
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.io.images import list_images
    from tpu3d.sfm.pipeline import run_extraction

    cfg = _build_config(args)
    names = list_images(args.images)
    if args.limit:
        names = names[: args.limit]
    t0 = time.time()
    _clear_prematch(args.artifacts)
    import jax

    if jax.process_count() > 1 and args.overlap:
        # Cross-host STAGE overlap: workers publish extraction batches as
        # they complete; process 0 prematches sequential edges while the
        # front-end is still running pod-wide (dist/overlap.py). The memo
        # is persisted for the match/reconstruct commands.
        from tpu3d.dist.overlap import run_overlapped_extraction

        memo = {}
        feats = run_overlapped_extraction(args.images, cfg, names,
                                          args.downscale, verbose=not args.quiet,
                                          prematch_memo=memo)
        if feats is not None:  # process 0
            _save_prematch(args.artifacts, memo, cfg)
            print(f"extracted {len(names)} images (stage-overlap, "
                  f"{jax.process_count()} processes) + prematched "
                  f"{len(memo)} edges in {time.time() - t0:.1f}s")
        return
    if jax.process_count() > 1:
        # Multi-host data parallelism for stage 1: each process extracts a
        # contiguous image shard on its local devices; process 0 merges the
        # shards through the shared artifact store (the reference is
        # single-device — SURVEY §2.2 parallelism table, DP row).
        from jax.experimental import multihost_utils

        from tpu3d.dist.overlap import _shard_ranges
        from tpu3d.io.artifacts import (clear_stale_feature_shards,
                                        merge_feature_shards,
                                        save_feature_shard)

        pid, nproc = jax.process_index(), jax.process_count()
        if nproc > len(names):
            raise ValueError(f"--distributed extract: {nproc} processes for "
                             f"{len(names)} images — every process needs a "
                             "non-empty shard")
        # Same stale-shard hazard as the overlap path: a leftover
        # features_shard* from a crashed run would be merged as if it were
        # this run's output. Clean before anyone can publish (barrier).
        if pid == 0:
            clear_stale_feature_shards(args.artifacts)
        multihost_utils.sync_global_devices("tpu3d_extract_dp_start")
        # Balanced split: the naive ceil split can hand a trailing
        # process an EMPTY shard (N=9, nproc=4) that crashes extraction.
        lo, hi = _shard_ranges(len(names), nproc)[pid]
        shard_names = names[lo:hi]
        feats = run_extraction(args.images, cfg, shard_names, args.downscale,
                               verbose=not args.quiet)
        save_feature_shard(args.artifacts, pid, feats)
        if pid == 0:
            merge_feature_shards(args.artifacts, nproc, names,
                                 args.downscale, t0)
            print(f"extracted {len(names)} images on {nproc} processes in "
                  f"{time.time() - t0:.1f}s -> {args.artifacts}/features.npz")
        return
    feats = run_extraction(args.images, cfg, names, args.downscale, verbose=not args.quiet)
    store = ArtifactStore(args.artifacts)
    store.save(
        "features",
        keypoints=feats.keypoints, keypoints_px=feats.keypoints_px,
        descriptors=feats.descriptors, valid=feats.valid,
        colors_bgr=feats.colors_bgr, image_size=feats.image_size,
    )
    store.save_json("features_meta", {"names": feats.names, "downscale": args.downscale,
                                      "seconds": time.time() - t0})
    print(f"extracted {len(names)} images in {time.time() - t0:.1f}s -> {args.artifacts}/features.npz")
    from tpu3d.sfm.pipeline import LAST_EXTRACT_TIMERS

    if LAST_EXTRACT_TIMERS:
        print(f"extract timers: {dict(LAST_EXTRACT_TIMERS)}")
    _print_dispatches()


def _enable_compile_cache():
    """Persistent XLA compilation cache shared across CLI invocations.
    Each stage command is its own process, so without this every stage
    re-pays its full compile bill (~20-40 s/stage over the remote-TPU
    tunnel) — a large slice of the full-run vs bench-rate gap (the bench
    prewarms + measures a second pass; the CLI never got to). Opt out
    with TPU3D_COMPILE_CACHE=''."""
    cache = os.environ.get("TPU3D_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/tpu3d_xla"))
    if not cache:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _print_dispatches():
    """Round-trip counts for the command just run (utils/dispatch.py) —
    the full-run stage-gap analysis needs dispatch counts next to walls."""
    from tpu3d.utils.dispatch import snapshot

    s = snapshot()
    if s:
        print("dispatches: " + json.dumps(s))


def _load_features(args):
    import jax.numpy as jnp

    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.sfm.pipeline import ExtractedFeatures

    store = ArtifactStore(args.artifacts)
    data = store.load("features")
    meta = store.load_json("features_meta")
    if data is None or meta is None:
        print("no features artifact — run `extract` first", file=sys.stderr)
        sys.exit(1)
    return ExtractedFeatures(
        names=meta["names"],
        keypoints=data["keypoints"],
        keypoints_px=data["keypoints_px"],
        valid=data["valid"],
        colors_bgr=data["colors_bgr"],
        image_size=data["image_size"],
        descriptors_dev=jnp.asarray(data["descriptors"]),
        valid_dev=jnp.asarray(data["valid"].astype(np.float32)),
        keypoints_dev=jnp.asarray(data["keypoints"]),
    ), meta


def cmd_match(args):
    from tpu3d.io.matches import save_matches
    from tpu3d.sfm.pipeline import run_matching, run_retrieval

    cfg = _build_config(args)
    t_load = time.time()
    # Overlap the gate executable's server-side compile with feature
    # loading + retrieval (the compile must use the RESCALED focal, so
    # rescale a throwaway config from the stored meta first).
    import json as _json

    from tpu3d.sfm.pipeline import prewarm_gate_async

    try:
        meta_peek = _json.load(open(os.path.join(args.artifacts,
                                                 "features_meta.json")))
        n_hint = len(meta_peek.get("names", []))
        prewarm_gate_async(_rescale_cfg(cfg, meta_peek, args), n_hint)
    except Exception:
        pass
    feats, meta = _load_features(args)
    cfg = _rescale_cfg(cfg, meta, args)
    t0 = time.time()
    adj = run_retrieval(feats, cfg)
    t_ret = time.time()
    memo = _load_prematch(args.artifacts, cfg)
    regs, ts = run_matching(feats, adj, cfg, verbose=not args.quiet,
                            memo=memo)
    t_m = time.time()
    from tpu3d.sfm.pipeline import LAST_MATCH_TIMERS

    # Populate the stage breakdown BEFORE save_matches so the persisted
    # matches artifact records it (the timers dict is serialized there).
    LAST_MATCH_TIMERS["load_upload"] = round(t0 - t_load, 2)
    LAST_MATCH_TIMERS["retrieval"] = round(t_ret - t0, 2)
    LAST_MATCH_TIMERS["match_total"] = round(t_m - t_ret, 2)
    t_s = time.time()
    save_matches(args.artifacts, regs, ts, adj, time.time() - t0)
    LAST_MATCH_TIMERS["save"] = round(time.time() - t_s, 2)
    n_edges = sum(len(r.edges) for r in regs)
    print(f"matched {len(regs)} images / {n_edges} edges in {time.time() - t0:.1f}s")
    _print_dispatches()
    if LAST_MATCH_TIMERS:
        print(f"match timers: {LAST_MATCH_TIMERS}")


def _rescale_cfg(cfg, meta, args):
    import dataclasses

    from tpu3d.config import CameraConfig

    focal = args.focal / meta.get("downscale", 1)
    cam = CameraConfig(focal_length=focal)
    return dataclasses.replace(
        cfg, camera=cam, sfm=dataclasses.replace(cfg.sfm, camera=cam)
    )


def cmd_reconstruct(args):
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.io.ply import write_ply
    from tpu3d.sfm.pipeline import (
        run_global_reconstruction, run_matching, run_reconstruction, run_retrieval,
    )

    cfg = _build_config(args)
    feats, meta = _load_features(args)
    cfg = _rescale_cfg(cfg, meta, args)
    t0 = time.time()
    from tpu3d.io.matches import load_matches, save_matches

    loaded = None
    if args.from_matches:
        loaded = load_matches(
            args.artifacts, len(feats.names), feats.keypoints.shape[1], cfg.sfm.max_tracks
        )
        if loaded is None:
            print("no saved matches — run `match` first", file=sys.stderr)
            sys.exit(1)
    if loaded is not None:
        pairs, ts, adj = loaded
    else:
        adj = run_retrieval(feats, cfg)
        memo = _load_prematch(args.artifacts, cfg)
        pairs, ts = run_matching(feats, adj, cfg, verbose=not args.quiet,
                                 memo=memo)
        save_matches(args.artifacts, pairs, ts, adj, time.time() - t0)
    if args.mode == "global":
        rec = run_global_reconstruction(feats, pairs, ts, cfg, verbose=not args.quiet, adj=adj)
    else:
        rec = run_reconstruction(feats, pairs, ts, cfg, verbose=not args.quiet, adj=adj)
    store = ArtifactStore(args.artifacts)
    store.save(
        "reconstruction",
        cams=rec.cams, registered=rec.registered, points=rec.points,
        colors_bgr=rec.colors_bgr, track_ids=rec.track_ids,
        extrinsics=rec.extrinsics(),
    )
    from tpu3d.sfm.pipeline import LAST_SFM_TIMERS

    store.save_json("reconstruction_meta", {
        "registered_names": rec.registered_names(),
        "mean_reproj_px": rec.mean_reproj_px,
        "num_obs": rec.num_obs,
        "mode": args.mode,
        "downscale": (meta or {}).get("downscale", args.downscale),
        "seconds": time.time() - t0,
        "sfm_phase_seconds": LAST_SFM_TIMERS,
        "sfm_backend": cfg.sfm.backend,
        # --register-all cameras: present in the pose set, excluded from
        # the BA gauge and (by default) from dense training.
        "low_confidence_names": [rec.image_names[i]
                                 for i in rec.low_confidence],
        # Per-camera sparse reprojection error — the dense stage's
        # objective camera-trust signal (drift-polluted poses show here).
        "per_camera_reproj_px": {rec.image_names[i]: round(e, 3)
                                 for i, e in rec.per_cam_reproj_px.items()},
    })
    if args.ply:
        n = write_ply(args.ply, rec.points, rec.colors_bgr)
        print(f"wrote {n} points -> {args.ply}")
    _print_dispatches()
    # JSON summary LAST: scripted callers parse the final stdout line.
    print(json.dumps({
        "registered": len(rec.registered), "points": int(len(rec.points)),
        "mean_reproj_px": rec.mean_reproj_px, "seconds": round(time.time() - t0, 1),
        **({"low_confidence": len(rec.low_confidence)}
           if len(rec.low_confidence) else {}),
    }))


def cmd_densify(args):
    from tpu3d.dense.eval import (dataset_from_views, evaluate_views,
                                  split_views_by_name)
    from tpu3d.dense.train import normalize_scene, rays_from_cameras, train_plenoxel
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.io.images import load_images

    cfg = _build_config(args)
    store = ArtifactStore(args.artifacts)
    if args.rays_pkl:
        _densify_from_rays(args, cfg, store)
        return
    rec = store.load("reconstruction")
    meta = store.load_json("reconstruction_meta")
    fmeta = store.load_json("features_meta")
    if rec is None:
        print("no reconstruction artifact — run `reconstruct` first", file=sys.stderr)
        sys.exit(1)
    # features_meta may be absent when the artifacts dir holds only a
    # reconstruction (e.g. full_run.py per-mode subdirs); reconstruction_meta
    # records the same downscale.
    ds = (fmeta or meta or {}).get("downscale", 1) * args.dense_downscale
    reg_names = meta["registered_names"]
    cams_all = rec["cams"]
    low = set(meta.get("low_confidence_names", []))
    if low and not args.include_low_confidence:
        # --register-all cameras carry no BA observations — their poses are
        # chained guesses. Training on their pixels injects wrong-pose
        # supervision, so dense excludes them unless explicitly included.
        keep = [k for k, n in enumerate(reg_names) if n not in low]
        print(f"excluding {len(reg_names) - len(keep)} low-confidence "
              "cameras from dense training (--include-low-confidence keeps them)")
        reg_names = [reg_names[k] for k in keep]
        cams_all = cams_all[keep]
    rec = dict(rec, cams=cams_all)
    gray, rgb = load_images(args.images, reg_names, ds)
    focal = args.focal / ds
    if args.eval_only:
        _densify_eval_only(args, cfg, store, rec, meta, reg_names, rgb, focal)
        return
    import dataclasses

    from tpu3d.dense.train import auto_near_far

    if args.contraction and args.model == "sdf":
        print("--contraction is implemented for the plenoxel model only "
              "(the SDF trainer's eikonal/band semantics assume an "
              "unwarped metric)", file=sys.stderr)
        sys.exit(2)
    if args.contraction:
        from tpu3d.dense.train import normalize_scene_contracted

        if args.occupancy:
            # The contraction sampler's disparity tail replaces occupancy-
            # guided sampling (_sample_z returns before the occupancy
            # branch) — building/pruning the occupancy grid would be wasted
            # work behind a misleading flag.
            print("--occupancy is ignored under --contraction (the "
                  "disparity-tail sampler overrides occupancy-guided "
                  "sampling)", file=sys.stderr)
            args.occupancy = False
        norm = normalize_scene_contracted(rec["points"],
                                          core_q=args.norm_core_q,
                                          core_radius=args.norm_core_radius)
        band_pts = rec["points"]
        if args.band_core_radius > 0:
            # Band-dilation intervention (the r5 provenance factor): a
            # drift tail in the cloud stretches the scene-derived far
            # plane (r5_legacy: far 16.6 vs 4.6 normalized units on the
            # compact rec) and with it the per-ray sample spacing through
            # the core. Under contraction the sampler's disparity tail
            # covers the shell beyond `far` anyway, so the uniform band
            # only needs to span the CORE content: derive it from points
            # within this normalized radius.
            r = np.linalg.norm(norm.apply(band_pts), axis=1)
            keep = r <= args.band_core_radius
            if keep.sum() >= 100:
                band_pts = band_pts[keep]
        near, far = auto_near_far(rec["cams"], band_pts, norm)
        # The disparity tail in the sampler reaches the shell beyond `far`;
        # per-ray AABB clipping must be OFF (the Euclidean box exit would
        # truncate the tail).
        cfg = dataclasses.replace(cfg, dense=dataclasses.replace(
            cfg.dense, per_ray_aabb=False, contraction=True))
    elif args.norm == "legacy":
        from tpu3d.dense.train import normalize_scene_legacy

        norm = normalize_scene_legacy(rec["points"])
        near, far = auto_near_far(rec["cams"], rec["points"], norm)
    elif args.norm == "core":
        norm = normalize_scene(rec["points"], core_q=args.norm_core_q,
                               margin=args.norm_margin)
        near, far = auto_near_far(rec["cams"], rec["points"], norm)
    else:  # coremax (default)
        from tpu3d.dense.train import normalize_scene_coremax

        norm = normalize_scene_coremax(rec["points"], q=args.coremax_q)
        near, far = auto_near_far(rec["cams"], rec["points"], norm)
    cfg = dataclasses.replace(cfg, dense=dataclasses.replace(
        cfg.dense, near=near, far=far, occupancy_prune=args.occupancy,
        tv_sigma=args.tv_sigma, tv_sh=args.tv_sh,
        coarse_epochs=args.coarse_epochs, exposure=args.exposure,
        sh_background=args.sh_background,
        sparsity_sigma=args.sparsity_sigma,
        camera_gate=args.camera_gate,
        camera_gate_epoch=args.camera_gate_epoch))
    print(f"scene-derived sampling band: near={near:.3f} far={far:.3f}")
    mesh = None
    if args.mesh:
        import jax

        from tpu3d.config import MeshConfig
        from tpu3d.dist import make_mesh

        if args.mesh == "auto":
            # Capacity-first default: every device a voxel brick — the
            # sharded grid is what lifts the 256^3 single-chip ceiling.
            mesh = make_mesh(MeshConfig(data_parallel=1,
                                        model_parallel=len(jax.devices())))
        else:
            dp, mp = (int(x) for x in args.mesh.lower().split("x"))
            mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))
        print(f"dense mesh: {dict(mesh.shape)} "
              f"(grid bricked x{tuple(mesh.shape.values())[1]})")
    grid0 = None
    if args.aniso_grid and not args.contraction:
        # Anisotropic grid: same voxel budget (R^3), box fit to the KEPT
        # cloud's normalized AABB with per-axis resolution proportional to
        # extent. An elongated scene (this one: a church wall) wastes a
        # third or more of a cube's voxels on empty margins; the tight box
        # converts them into linear resolution where the content is — the
        # only capacity lever left on one chip (256^3 ceiling).
        from tpu3d.dense.grid import create_grid
        from tpu3d.dense.train import core_points

        kept = core_points(rec["points"], q=args.coremax_q, k=1.0)
        pn = norm.apply(kept if len(kept) else rec["points"])
        lo = np.percentile(pn, 0.5, axis=0).astype(np.float32)
        hi = np.percentile(pn, 99.5, axis=0).astype(np.float32)
        pad = 0.05 * (hi - lo) + 1e-3
        lo, hi = lo - pad, hi + pad
        ext = hi - lo
        R = cfg.dense.grid_resolution
        s = float((R**3 / np.prod(ext)) ** (1.0 / 3.0))
        # The brick-sharded TP trainer requires X % model_parallel == 0;
        # round the X axis to a multiple of lcm(8, MP) when a mesh is set
        # so make_tp_dense_step doesn't fail after rays are already built.
        mults = [8, 8, 8]
        if mesh is not None:
            mults[0] = int(np.lcm(8, tuple(mesh.shape.values())[1]))
        res = tuple(int(np.clip(round(e * s / m) * m, max(32, m), 2 * R))
                    for e, m in zip(ext, mults))
        grid0 = create_grid(res, lo, hi)
        print(f"anisotropic grid: {res} over extents "
              f"{np.round(ext, 2).tolist()} (budget {R}^3)")
    # Name-keyed holdout: the same physical views are held out for every
    # reconstruction of this dataset (positional splits made cross-rec
    # PSNRs incomparable — each rec got a different holdout lottery).
    train_idx, test_idx = split_views_by_name(reg_names, args.holdout_every)
    dataset = dataset_from_views(rec["cams"], rgb, focal, train_idx, norm,
                                 stride=args.ray_stride)
    print(f"{len(dataset.origins)} rays from {len(train_idx)} train cameras "
          f"({len(test_idx)} held out)")
    dcfg = cfg.dense
    # Checkpoints download the full grid + Adam moments (5.7 GB at 256^3)
    # over the remote-TPU tunnel — minutes per epoch; off for experiments.
    ck_store = None if args.no_checkpoint else store
    if args.detail_only:
        # Cascade process isolation (r5): one process per phase. Running
        # base + detail + eval in ONE process OOM'd at whatever came after
        # detail training — three times, three different allocation sites
        # (a (3,) fetch, a PRNGKey, a 66 MB channel slice) — because the
        # packed base + packed detail + moment + both unpacked grids leave
        # no headroom and the axon server frees lazily. Here the base is
        # LOADED (host numpy; the trainer packs it and the unpacked device
        # upload is transient), only the detail phase trains, and
        # --eval-only scores the saved pair in a third process.
        import jax.numpy as jnp

        from tpu3d.dense.grid import VoxelGrid as _VG

        d = store.load("dense_grid")
        if d is None or args.model == "sdf" or mesh is not None:
            print("--detail-only needs a saved dense_grid (run the base "
                  "densify with --final-grid first) and the plenoxel "
                  "single-chip path", file=sys.stderr)
            sys.exit(1)
        grid = _VG(d["grid"],  # host numpy on purpose — see note above
                   jnp.asarray(d["min_bound"], jnp.float32),
                   jnp.asarray(d["max_bound"], jnp.float32))
        losses = []
        if args.detail_epochs <= 0:
            args.detail_epochs = 4
    elif args.model == "sdf":
        from tpu3d.dense.train import train_sdf

        grid, losses = train_sdf(dataset, dcfg, verbose=not args.quiet,
                                 mesh=mesh, grid=grid0)
        # Evaluate with the TRAINING band semantics (pure per-ray AABB,
        # render_rays_aabb: near=0/far=box-exit) — rendering the SDF grid
        # with the scene-derived [near, far] band instead measured a bogus
        # 10.6 dB on a 21 dB-train-fit model (band mismatch, not quality).
        dcfg = dataclasses.replace(dcfg, near=1e-3, far=1e3, per_ray_aabb=True)
    else:
        grid, losses = train_plenoxel(dataset, dcfg, verbose=not args.quiet,
                                      checkpoint_store=ck_store, resume=args.resume,
                                      mesh=mesh, grid=grid0)
    detail_grid = None
    if args.detail_epochs > 0 and args.model != "sdf" and mesh is None:
        # Cascade phase 2 (r5): a fresh RESIDUAL detail grid over the kept
        # cloud's box in SAMPLE space (contracted coords when contraction
        # is on), trained against the frozen base — ~1.5-2x the base's
        # voxels-per-unit where the content lives, the single-chip answer
        # to the 256^3 capacity ceiling (VERDICT r4 #3; the tail views are
        # voxel-footprint-bound). Per-axis resolution at a cube budget,
        # aniso-style; beyond-box content stays explained by the BASE, so
        # the box-crop fog mechanism that sank the r4 aniso grid does not
        # apply. rmsprop (one moment) keeps base+detail+moments in 16 GB.
        from tpu3d.dense.grid import create_grid as _cg
        from tpu3d.dense.train import core_points

        kept = core_points(rec["points"], q=args.coremax_q, k=1.0)
        pn = norm.apply(kept if len(kept) else rec["points"]).astype(np.float32)
        if getattr(dcfg, "contraction", False):
            import jax.numpy as _jnp

            from tpu3d.dense.contract import contract as _contract

            pn = np.asarray(_contract(_jnp.asarray(pn)))
        lo = np.percentile(pn, 0.5, axis=0).astype(np.float32)
        hi = np.percentile(pn, 99.5, axis=0).astype(np.float32)
        pad = 0.05 * (hi - lo) + 1e-3
        lo, hi = lo - pad, hi + pad
        bmin = np.asarray(grid.min_bound, np.float32)
        bmax = np.asarray(grid.max_bound, np.float32)
        lo = np.maximum(lo, bmin)
        hi = np.minimum(hi, bmax)
        Rd = args.detail_res or dcfg.grid_resolution
        ext = np.maximum(hi - lo, 1e-3)
        sfact = float((Rd**3 / np.prod(ext)) ** (1.0 / 3.0))
        dres = tuple(int(np.clip(round(e * sfact / 8) * 8, 32, 2 * Rd))
                     for e in ext)
        print(f"[cascade] detail grid {dres} over box {np.round(lo, 2).tolist()}"
              f"..{np.round(hi, 2).tolist()} "
              f"({dres[0] / ext[0]:.0f} vox/unit vs base "
              f"{grid.grid.shape[0] / float(bmax[0] - bmin[0]):.0f})")
        dg0 = _cg(dres, lo, hi, init=0.0)
        det_cfg = dataclasses.replace(
            dcfg, epochs=args.detail_epochs, coarse_epochs=0,
            camera_gate=False, exposure=False, sh_background=False,
            optimizer="rmsprop")
        detail_grid, det_losses = train_plenoxel(
            dataset, det_cfg, grid=dg0, base_grid=grid,
            verbose=not args.quiet)
        losses = losses + det_losses
        # Host-known bounds for meta/eval bookkeeping: RUN K r5 OOM'd on a
        # (3,)-element device fetch right after detail training (the axon
        # heap was still draining freed train buffers) — never fetch what
        # the host already knows.
        detail_bounds_host = (lo.tolist(), hi.tolist())
        if not args.no_checkpoint or args.final_grid:
            store.save("dense_grid_detail",
                       grid=_fetch_grid_host(detail_grid.grid),
                       min_bound=lo, max_bound=hi)
    from tpu3d.dense.train import LAST_TRAIN_AUX

    bg_sh = LAST_TRAIN_AUX.get("background")
    if (not args.no_checkpoint or args.final_grid) and not args.detail_only:
        extra = {} if bg_sh is None else {"bg_sh": bg_sh}
        store.save("dense_grid", grid=_fetch_grid_host(grid.grid),
                   min_bound=np.asarray(grid.min_bound),
                   max_bound=np.asarray(grid.max_bound), **extra)
    # Compact mesh-ready grid (density + per-color SH DC, f16): the full
    # 28-channel grid is 1.9 GB at 256^3 — minutes over the tunnel; these
    # 4 channels feed `cli mesh` (marching tetrahedra surface export).
    import jax.numpy as jnp

    # Channel-at-a-time download: a single take over the full grid
    # allocates another grid-sized buffer next to the training leftovers
    # (observed ResourceExhausted at the 256^3-budget anisotropic shape);
    # per-channel slices peak at X*Y*Z floats. Export failures must never
    # lose a finished training run — eval still follows.
    try:
        mg = np.stack([np.asarray(grid.grid[..., c]) for c in (0, 1, 10, 19)],
                      axis=-1).astype(np.float16)
        store.save("mesh_grid", grid=mg,
                   min_bound=np.asarray(grid.min_bound),
                   max_bound=np.asarray(grid.max_bound),
                   contraction=np.asarray(bool(getattr(dcfg, "contraction", False))))
    except Exception as e:  # pragma: no cover - device OOM path
        print(f"mesh_grid export failed ({type(e).__name__}) — continuing "
              "to eval", file=sys.stderr)
    # Render/eval provenance for `cli render`: the exact sampling band +
    # semantics this grid was evaluated with (the SDF band replace above
    # must be captured — rendering an SDF grid with the scene band measures
    # band mismatch, not quality).
    store.save_json("dense_meta", {
        "model": args.model, "near": float(dcfg.near), "far": float(dcfg.far),
        "num_samples": int(dcfg.num_samples),
        "per_ray_aabb": bool(dcfg.per_ray_aabb), "downscale": int(ds),
        "contraction": bool(getattr(dcfg, "contraction", False)),
        # The exact normalization this grid was trained under: render/eval
        # must reuse it verbatim — recomputing from the cloud breaks the
        # moment normalization defaults change.
        "norm_center": np.asarray(norm.center, np.float64).tolist(),
        "norm_scale": float(norm.scale),
        "cascade_detail": (None if detail_grid is None else {
            "res": [int(r) for r in detail_grid.grid.shape[:3]],
            "min_bound": detail_bounds_host[0],
            "max_bound": detail_bounds_host[1],
        }),
    })
    dropped_local = LAST_TRAIN_AUX.get("dropped_cameras", [])
    out = {"final_loss": losses[-1] if losses else None,
           "psnr_train_proxy": -10 * np.log10(losses[-1]) if losses else None,
           # gate indices are into the TRAIN camera list; report names
           "dropped_cameras": [reg_names[int(train_idx[c])]
                               for c in dropped_local]}
    if len(test_idx) and args.detail_only:
        # Cascade process isolation: scoring happens in the --eval-only
        # process; an in-process eval here is exactly the OOM this mode
        # exists to avoid.
        test_idx = test_idx[:0]
    if len(test_idx):
        def _eval_oom_retry():
            # Right after cascade training the device heap is briefly
            # saturated (base + detail + rmsprop moment ~5.6 GB plus
            # training leftovers that the axon server frees LAZILY): r5
            # RUN K died on a PRNGKey-sized allocation at eval entry, 30
            # minutes of training done, eval never run. Freed buffers
            # drain within seconds; retry with backoff instead of dying.
            import gc
            import time as _time
            for attempt in range(4):
                try:
                    if detail_grid is not None:
                        return evaluate_views(
                            detail_grid, rec["cams"][test_idx],
                            rgb[test_idx], focal, dcfg, norm, stride=2,
                            max_views=args.max_eval_views, bg_sh=bg_sh,
                            base_grid=grid)
                    return evaluate_views(
                        grid, rec["cams"][test_idx], rgb[test_idx],
                        focal, dcfg, norm, stride=2,
                        max_views=args.max_eval_views, bg_sh=bg_sh)
                except Exception as e:  # pragma: no cover - device OOM path
                    if ("RESOURCE_EXHAUSTED" not in str(e)
                            and "ResourceExhausted" not in str(e)) or attempt == 3:
                        raise
                    print(f"eval OOM (attempt {attempt + 1}) — waiting for "
                          "the device heap to drain", file=sys.stderr)
                    gc.collect()
                    _time.sleep(20 * (attempt + 1))

        ev = _eval_oom_retry()
        out.update(test_psnr=ev["mean_psnr"],
                   test_psnr_per_view=[round(p, 2) for p in ev["per_view"]],
                   test_psnr_calibrated=ev["mean_psnr_calibrated"],
                   test_psnr_core=round(ev["psnr_core"], 2),
                   test_psnr_background=round(ev["psnr_background"], 2),
                   core_pixel_fraction=round(ev["core_pixel_fraction"], 3))
        # Trusted-view split: a held-out view whose SPARSE per-camera
        # reprojection error is a robust outlier has an unreliable pose —
        # its PSNR measures pose error, not grid quality. Reported NEXT TO
        # (never instead of) the all-views number.
        pc = (meta or {}).get("per_camera_reproj_px") or {}
        if pc:
            vals = np.asarray(list(pc.values()))
            thr = float(np.median(vals)
                        + 3 * 1.4826 * np.median(np.abs(vals - np.median(vals))))
            pv = ev["per_view"]
            tnames = [reg_names[k] for k in test_idx[: len(pv)]]
            # Cameras absent from per_camera_reproj_px carry no BA
            # observations (register-all low-confidence chains) — their
            # poses are the LEAST trusted, so missing defaults to inf.
            ok = [i for i, n in enumerate(tnames)
                  if pc.get(n, float("inf")) <= thr]
            if ok and len(ok) < len(pv):
                out.update(
                    test_psnr_trusted=round(float(np.mean([pv[i] for i in ok])), 2),
                    untrusted_test_views=[tnames[i] for i in range(len(pv))
                                          if i not in ok])
        try:
            from PIL import Image

            Image.fromarray((np.clip(ev["renders"][0], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.artifacts, "test_render0.png"))
            gt0 = rgb[test_idx[0]][::2, ::2]
            Image.fromarray(gt0).save(os.path.join(args.artifacts, "test_gt0.png"))
        except Exception:
            pass
        out["test_view_names"] = [reg_names[k] for k in test_idx]
    # Persist the result next to the grid: PSNRs used to live only on
    # stdout, so a dead session lost the round's dense numbers (r5 runs
    # J/K had to be re-run for exactly this reason).
    out["recipe"] = {
        "epochs": dcfg.epochs, "coarse_epochs": dcfg.coarse_epochs,
        "grid_resolution": dcfg.grid_resolution,
        "contraction": bool(getattr(dcfg, "contraction", False)),
        "coremax_q": args.coremax_q, "detail_epochs": args.detail_epochs,
        "model": args.model,
    }
    store.save_json("dense_result", out)
    print(json.dumps(out))


def _fetch_grid_host(garr, retries: int = 4):
    """Channel-at-a-time device->host fetch with OOM backoff. A whole-grid
    np.asarray needs a grid-sized relayout/staging allocation on the axon
    backend, which right after cascade training does not exist (r5 RUN K3
    died exactly here, 35 minutes in, fetching the trained detail grid);
    per-channel slices peak at X*Y*Z floats (~66 MB) instead."""
    import gc
    import time as _t

    C = garr.shape[-1]
    for attempt in range(retries):
        try:
            return np.stack([np.asarray(garr[..., c]) for c in range(C)],
                            axis=-1)
        except Exception as e:  # pragma: no cover - device OOM path
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "ResourceExhausted" not in str(e)) or attempt == retries - 1:
                raise
            print(f"grid fetch OOM (attempt {attempt + 1}) — waiting for "
                  "the device heap to drain", file=sys.stderr)
            gc.collect()
            _t.sleep(20 * (attempt + 1))


def _densify_eval_only(args, cfg, store, rec, meta, reg_names, rgb, focal):
    """Evaluate SAVED dense grids (dense_grid [+ dense_grid_detail]) in a
    fresh process. The cascade's post-training eval can OOM on the training
    process's still-resident device buffers (r5 RUN K: base+detail trained
    ~30 min, then eval died through the whole retry ladder — twice). All
    sampling semantics come from dense_meta: the exact band/normalization
    the grid was trained under."""
    import dataclasses

    import jax.numpy as jnp

    from tpu3d.dense.eval import evaluate_views, split_views_by_name
    from tpu3d.dense.grid import VoxelGrid
    from tpu3d.dense.train import SceneNormalization

    dm = store.load_json("dense_meta")
    d = store.load("dense_grid")
    if dm is None or d is None:
        print("no dense_grid/dense_meta — run densify with checkpoints "
              "first", file=sys.stderr)
        sys.exit(1)

    def _vg(z):
        return VoxelGrid(jnp.asarray(z["grid"], jnp.float32),
                         jnp.asarray(z["min_bound"], jnp.float32),
                         jnp.asarray(z["max_bound"], jnp.float32))

    grid = _vg(d)
    bg_sh = d.get("bg_sh")
    dd = store.load("dense_grid_detail")
    detail_grid = _vg(dd) if dd is not None else None
    norm = SceneNormalization(
        center=np.asarray(dm["norm_center"], np.float32),
        scale=float(dm["norm_scale"]))
    dcfg = dataclasses.replace(
        cfg.dense, near=float(dm["near"]), far=float(dm["far"]),
        num_samples=int(dm["num_samples"]),
        per_ray_aabb=bool(dm["per_ray_aabb"]),
        contraction=bool(dm.get("contraction", False)))
    train_idx, test_idx = split_views_by_name(reg_names, args.holdout_every)
    if not len(test_idx):
        print("holdout split is empty — nothing to evaluate", file=sys.stderr)
        sys.exit(1)
    if detail_grid is not None:
        ev = evaluate_views(detail_grid, rec["cams"][test_idx],
                            rgb[test_idx], focal, dcfg, norm, stride=2,
                            max_views=args.max_eval_views, bg_sh=bg_sh,
                            base_grid=grid)
    else:
        ev = evaluate_views(grid, rec["cams"][test_idx], rgb[test_idx],
                            focal, dcfg, norm, stride=2,
                            max_views=args.max_eval_views, bg_sh=bg_sh)
    out = {
        "eval_only": True, "cascade": detail_grid is not None,
        "test_psnr": ev["mean_psnr"],
        "test_psnr_per_view": [round(p, 2) for p in ev["per_view"]],
        "test_psnr_calibrated": ev["mean_psnr_calibrated"],
        "test_psnr_core": round(ev["psnr_core"], 2),
        "test_psnr_background": round(ev["psnr_background"], 2),
        "core_pixel_fraction": round(ev["core_pixel_fraction"], 3),
        "test_view_names": [reg_names[k] for k in test_idx],
    }
    pc = (meta or {}).get("per_camera_reproj_px") or {}
    if pc:
        vals = np.asarray(list(pc.values()))
        thr = float(np.median(vals)
                    + 3 * 1.4826 * np.median(np.abs(vals - np.median(vals))))
        pv = ev["per_view"]
        tnames = [reg_names[k] for k in test_idx[: len(pv)]]
        ok = [i for i, n in enumerate(tnames) if pc.get(n, float("inf")) <= thr]
        if ok and len(ok) < len(pv):
            out["test_psnr_trusted"] = round(float(np.mean([pv[i] for i in ok])), 2)
    store.save_json("dense_result", out)
    print(json.dumps(out))


def _densify_from_rays(args, cfg, store):
    """Train the dense stage from a reference-protocol external ray dataset
    (the reference's only dense input path: a hard-coded absolute
    training_data.pkl of (N, 9) [origin, dir, rgb] rows — sdf.py:420,
    plenoxel.py:126-127). Near/far default to the reference's hn=2/hf=6."""
    import dataclasses

    from tpu3d.dense.train import psnr, train_plenoxel
    from tpu3d.io.raydata import load_ray_dataset

    dataset = load_ray_dataset(args.rays_pkl)
    print(f"{len(dataset.origins)} rays from {args.rays_pkl}")
    dcfg = cfg.dense
    if args.near > 0 or args.far > 0:
        dcfg = dataclasses.replace(
            dcfg,
            near=args.near if args.near > 0 else dcfg.near,
            far=args.far if args.far > 0 else dcfg.far,
        )
    dcfg = dataclasses.replace(dcfg, occupancy_prune=args.occupancy,
                               tv_sigma=args.tv_sigma, tv_sh=args.tv_sh)
    if args.model == "sdf":
        from tpu3d.dense.train import train_sdf

        grid, losses = train_sdf(dataset, dcfg, verbose=not args.quiet)
    else:
        ck = None if args.no_checkpoint else store
        grid, losses = train_plenoxel(dataset, dcfg, verbose=not args.quiet,
                                      checkpoint_store=ck, resume=args.resume)
    if not args.no_checkpoint:
        store.save("dense_grid", grid=np.asarray(grid.grid),
                   min_bound=np.asarray(grid.min_bound),
                   max_bound=np.asarray(grid.max_bound))
    out = {"final_loss": losses[-1] if losses else None,
           "psnr_train_proxy": -10 * np.log10(losses[-1]) if losses else None}
    if args.test_rays_pkl:
        import jax
        import jax.numpy as jnp

        from tpu3d.dense.render import render_image

        test = load_ray_dataset(args.test_rays_pkl)
        pred = render_image(grid, jax.random.PRNGKey(0),
                            jnp.asarray(test.origins), jnp.asarray(test.dirs),
                            dcfg.near, dcfg.far, dcfg.num_samples,
                            clip_aabb=dcfg.per_ray_aabb)
        out["test_psnr"] = psnr(np.asarray(pred), test.rgb)
    print(json.dumps(out))


def cmd_mesh(args):
    """Surface mesh from the trained density grid (marching tetrahedra over
    the compact mesh_grid artifact densify saves) — the deliverable beyond
    the reference's point clouds and view renders."""
    from tpu3d.dense.mesh import dedup_mesh, marching_tetrahedra
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.io.ply import write_ply_mesh

    store = ArtifactStore(args.artifacts)
    d = store.load("mesh_grid")
    if d is None:
        print("no mesh_grid artifact — run `densify` first", file=sys.stderr)
        sys.exit(1)
    sigma = d["grid"][..., 0].astype(np.float32)
    # channel layout: [sigma, SH-DC r, g, b]; DC term Y00 = 0.282095
    rgb = np.clip(d["grid"][..., 1:4].astype(np.float32) * 0.282095, 0.0, 1.0)
    iso = args.iso
    if iso <= 0:  # auto: density units depend on scene scale — pick the
        # level that keeps the top ~1% most-opaque cells inside the surface
        pos = sigma[sigma > 0]
        iso = float(np.quantile(pos, 0.99)) if len(pos) else 0.0
        print(f"auto iso level: {iso:.3f}", file=sys.stderr)
    verts, faces, cols = marching_tetrahedra(
        sigma, iso, d["min_bound"], d["max_bound"], rgb)
    verts, faces, cols = dedup_mesh(verts, faces, cols)
    if bool(np.asarray(d.get("contraction", False))):
        # Contracted grids store geometry in warped coordinates; unwarp the
        # extracted surface back to the normalized scene frame so the mesh
        # is metrically meaningful (dense/contract.py::contract_inv).
        from tpu3d.dense.contract import contract_inv

        verts = np.asarray(contract_inv(np.asarray(verts, np.float32)))
    out = args.out or os.path.join(args.artifacts, "mesh.ply")
    n = write_ply_mesh(out, verts, faces, cols)
    print(json.dumps({"vertices": int(len(verts)), "faces": int(n),
                      "iso": round(iso, 4), "path": out}))


def cmd_render(args):
    """Render registered views and/or a novel-view orbit from the trained
    dense grid to PNGs — the reference's test protocol (plenoxel.py:46-61,
    134-135 renders train views 0/60/120/180 to Imgs/img_i.png), plus a
    trajectory-interpolated flythrough the reference has no equivalent of."""
    import dataclasses

    import jax.numpy as jnp
    from PIL import Image

    from tpu3d.dense.eval import interpolate_poses, render_view
    from tpu3d.dense.grid import VoxelGrid
    from tpu3d.dense.train import SceneNormalization, auto_near_far
    from tpu3d.io.artifacts import ArtifactStore

    cfg = _build_config(args)
    store = ArtifactStore(args.artifacts)
    rec = store.load("reconstruction")
    if rec is None:
        print("no reconstruction artifact — run `reconstruct` first", file=sys.stderr)
        sys.exit(1)
    d = store.load("dense_grid")
    dc_only = False
    if d is None:
        # Fall back to the compact mesh grid (density + SH DC): renders are
        # view-independent DC color, but always available after densify.
        m = store.load("mesh_grid")
        if m is None:
            print("no dense_grid/mesh_grid artifact — run `densify` first", file=sys.stderr)
            sys.exit(1)
        g = np.zeros((*m["grid"].shape[:3], 28), np.float32)
        for src, dst in [(0, 0), (1, 1), (2, 10), (3, 19)]:
            g[..., dst] = m["grid"][..., src].astype(np.float32)
        d = {"grid": g, "min_bound": m["min_bound"], "max_bound": m["max_bound"]}
        dc_only = True
    grid = VoxelGrid(jnp.asarray(d["grid"], jnp.float32),
                     jnp.asarray(d["min_bound"], jnp.float32),
                     jnp.asarray(d["max_bound"], jnp.float32))
    bg_sh = d.get("bg_sh")  # learned SH background, when trained with it
    meta = store.load_json("dense_meta") or {}
    rmeta = store.load_json("reconstruction_meta") or {}
    fmeta = store.load_json("features_meta") or {}
    contracted = bool(meta.get("contraction", False))
    if "norm_center" in meta:
        # The normalization the grid was actually trained under (recorded
        # by densify) — never recompute from the cloud here.
        norm = SceneNormalization(np.asarray(meta["norm_center"], np.float32),
                                  float(meta["norm_scale"]))
    elif contracted:
        from tpu3d.dense.train import normalize_scene_contracted

        norm = normalize_scene_contracted(rec["points"])
    else:
        # Grids predating the recorded-norm field were trained under the
        # legacy normalization.
        from tpu3d.dense.train import normalize_scene_legacy

        norm = normalize_scene_legacy(rec["points"])
    ds = int(meta.get("downscale") or
             (fmeta or rmeta or {}).get("downscale", 1) * args.dense_downscale)
    focal = args.focal / ds
    name0 = rmeta.get("registered_names", [None])[0]
    if name0 is None:
        print("reconstruction_meta lacks registered_names", file=sys.stderr)
        sys.exit(1)
    with Image.open(os.path.join(args.images, name0)) as im:
        W, H = im.width // ds, im.height // ds
    if meta:
        near, far = float(meta["near"]), float(meta["far"])
    else:
        near, far = auto_near_far(rec["cams"], rec["points"], norm)
    dcfg = dataclasses.replace(
        cfg.dense, near=near, far=far,
        num_samples=int(meta.get("num_samples", cfg.dense.num_samples)),
        per_ray_aabb=bool(meta.get("per_ray_aabb", cfg.dense.per_ray_aabb)),
        contraction=contracted)
    out_dir = args.out or os.path.join(args.artifacts, "renders")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    cams = rec["cams"]
    written = []

    def save(img, name):
        path = os.path.join(out_dir, name)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
        written.append(name)

    if args.render_views:
        for v in [int(s) for s in args.render_views.split(",") if s.strip()]:
            if not 0 <= v < len(cams):
                print(f"view {v} out of range (registered: {len(cams)})",
                      file=sys.stderr)
                continue
            img = render_view(grid, cams[v], H, W, focal, dcfg, norm,
                              stride=args.render_stride, bg_sh=bg_sh)
            save(img, f"view_{v:04d}.png")
    if args.orbit > 0:
        for k, cam in enumerate(interpolate_poses(cams, args.orbit)):
            img = render_view(grid, cam, H, W, focal, dcfg, norm,
                              stride=args.render_stride, bg_sh=bg_sh)
            save(img, f"orbit_{k:04d}.png")
    print(json.dumps({
        "frames": len(written), "out": out_dir, "hw": [H, W],
        "dc_only_colors": dc_only, "seconds": round(time.time() - t0, 1),
    }))


def cmd_export(args):
    """Write the reference pipeline's exact output/ file protocol (SURVEY
    §1) from saved artifacts, so tools built against the reference
    (its sdf/plenoxel loaders, numpy2ply.py, viewers) work unchanged."""
    from tpu3d.io.reference_export import export_reference_layout

    out = args.out or os.path.join(args.artifacts, "output")
    written = export_reference_layout(args.artifacts, out)
    print(json.dumps({"out": out, "written": written}))


def cmd_ingest(args):
    """One-command learned-weights ingest: convert a torch checkpoint
    (.pth/.pt) into the flat .npz param store the pipeline loads WITHOUT
    torch at runtime. The reference's production front-end is DISK +
    LightGlue (feature_extraction.py:28, matching.py:122) whose published
    checkpoints download at import time — here the drop-in path is:

      tpu3d ingest --frontend disk --frontend-weights disk.pth --out disk.npz
      tpu3d ingest --matcher lightglue --matcher-weights lg.pth --out lg.npz
      tpu3d extract ... --frontend disk --frontend-weights disk.npz
    """
    from tpu3d.features.learned import (
        load_frontend_params, load_matcher_params, save_params_npz,
    )

    if args.matcher_weights and args.frontend_weights:
        print("ingest converts ONE checkpoint: give either "
              "--frontend-weights or --matcher-weights", file=sys.stderr)
        sys.exit(2)
    if args.matcher_weights:
        params = load_matcher_params(args.matcher_weights)
        kind, src = "lightglue", args.matcher_weights
    elif args.frontend_weights:
        params = load_frontend_params(args.frontend, args.frontend_weights)
        kind, src = args.frontend, args.frontend_weights
    else:
        print("ingest needs --frontend-weights CKPT or --matcher-weights "
              "CKPT", file=sys.stderr)
        sys.exit(2)
    out = args.out or (os.path.splitext(src)[0] + ".npz")
    save_params_npz(out, params)
    import jax

    n_arrays = len(jax.tree_util.tree_leaves(params))
    print(json.dumps({"model": kind, "source": src, "out": out,
                      "arrays": n_arrays}))


def cmd_full(args):
    from tpu3d.io.ply import write_ply
    from tpu3d.sfm.pipeline import reconstruct

    cfg = _build_config(args)
    from tpu3d.io.images import list_images

    names = list_images(args.images)
    if args.limit:
        names = names[: args.limit]
    rec, timings = reconstruct(args.images, cfg, names, args.downscale,
                               verbose=not args.quiet, mode=args.mode)
    # Persist the same artifacts the staged commands produce, so `densify`
    # (and the export/mesh/render commands) can consume a one-process e2e
    # run directly — the e2e path is the wall-clock-optimal full-dataset
    # driver (one TPU-pool claim, gate compile prewarmed behind extract).
    # Artifacts FIRST, then the PLY: the store creates the artifacts dir,
    # and a PLY path inside it must not crash a finished 290-image run
    # (r5: it did — FileNotFoundError after 407 s of work).
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.sfm.pipeline import LAST_SFM_TIMERS

    store = ArtifactStore(args.artifacts)
    store.save_json("features_meta", {"names": names,
                                      "downscale": args.downscale,
                                      "num_images": len(names)})
    store.save(
        "reconstruction",
        cams=rec.cams, registered=rec.registered, points=rec.points,
        colors_bgr=rec.colors_bgr, track_ids=rec.track_ids,
        extrinsics=rec.extrinsics(),
    )
    store.save_json("reconstruction_meta", {
        "registered_names": rec.registered_names(),
        "mean_reproj_px": rec.mean_reproj_px,
        "num_obs": rec.num_obs,
        "mode": args.mode,
        "downscale": args.downscale,
        "seconds": round(timings["total"], 1),
        "sfm_phase_seconds": LAST_SFM_TIMERS,
        "sfm_backend": cfg.sfm.backend,
        "low_confidence_names": [rec.image_names[i]
                                 for i in rec.low_confidence],
        "per_camera_reproj_px": {rec.image_names[i]: round(e, 3)
                                 for i, e in rec.per_cam_reproj_px.items()},
    })
    if args.ply:
        write_ply(args.ply, rec.points, rec.colors_bgr)
    _print_dispatches()
    from tpu3d.sfm.pipeline import LAST_EXTRACT_TIMERS, LAST_MATCH_TIMERS

    print(json.dumps({
        "registered": len(rec.registered), "points": int(len(rec.points)),
        "mean_reproj_px": rec.mean_reproj_px,
        "stage_seconds": {k: round(v, 1) for k, v in timings.items()},
        "extract_timers": dict(LAST_EXTRACT_TIMERS),
        "match_timers": dict(LAST_MATCH_TIMERS),
    }))


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpu3d", description="TPU-native incremental SfM + dense reconstruction")
    p.add_argument("command", choices=["extract", "match", "reconstruct", "densify", "full", "export", "mesh", "render", "ingest"])
    p.add_argument("--images", default="",
                   help="image directory (required for all commands except "
                        "ingest)")
    p.add_argument("--artifacts", default="artifacts")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--dense-downscale", type=int, default=4)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--focal", type=float, default=2378.98305085)
    p.add_argument("--max-keypoints", type=int, default=2048)
    p.add_argument("--frontend", choices=["classical", "disk", "superpoint"],
                   default="classical",
                   help="feature extractor: classical (weight-free) or a "
                        "learned model (needs --frontend-weights)")
    p.add_argument("--frontend-weights", default="",
                   help="DISK/SuperPoint checkpoint (.pth torch or converted .npz)")
    p.add_argument("--matcher", choices=["mnn", "lightglue"], default="mnn",
                   help="descriptor matcher: mutual-NN or LightGlue "
                        "(needs --matcher-weights)")
    p.add_argument("--matcher-weights", default="",
                   help="LightGlue checkpoint (.pth torch or converted .npz)")
    p.add_argument("--max-tracks", type=int, default=400_000)
    p.add_argument("--min-raw-matches", type=int, default=100)
    p.add_argument("--ransac-hypotheses", type=int, default=512)
    p.add_argument("--global-ba-every", type=int, default=8)
    p.add_argument("--global-ba-growth", type=float, default=1.12,
                   help="min problem growth between global BAs (1 = every-N)")
    p.add_argument("--register-batch", type=int, default=8,
                   help="images per fused registration dispatch")
    p.add_argument("--no-midrun-refit", action="store_true",
                   help="skip the prune-refit solve on mid-run global BAs "
                        "(pruned weights take effect at the next BA; the "
                        "final BA always refits) — ~70 s of the full-run "
                        "global-BA bill, A/B for recall impact")
    p.add_argument("--register-all", action="store_true",
                   help="after the final BA, place every remaining image "
                        "by relaxed relative-pose chaining, marked "
                        "low_confidence (excluded from the BA gauge and "
                        "from dense training) — the reference's never-"
                        "reject 290/290 semantics, honestly flagged")
    p.add_argument("--sfm-backend",
                   choices=["auto", "default", "cpu", "hybrid"],
                   default="auto",
                   help="engine placement: cpu pins registration+BA to the "
                        "host (latency-bound small dispatches); hybrid "
                        "keeps registration on the host but runs the "
                        "windowed/global BA solves on the accelerator")
    p.add_argument("--local-window", type=int, default=25,
                   help="windowed-BA camera count between global BAs")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--ray-stride", type=int, default=2)
    p.add_argument("--model", choices=["plenoxel", "sdf"], default="plenoxel",
                   help="dense model: plenoxel density grid or SDF grid (ref sdf.py)")
    p.add_argument("--contraction", action="store_true",
                   help="radial scene contraction: core linear in the unit "
                        "ball, far field in the outer shell (dense/contract.py)")
    p.add_argument("--norm", choices=["coremax", "core", "legacy"],
                   default="coremax",
                   help="scene normalization: coremax (gauge-invariant "
                        "relative filter + max extent, default), core "
                        "(percentile-radius crop; needs --sh-background), "
                        "or the legacy mean+300 filter")
    p.add_argument("--norm-core-q", type=float, default=92.0,
                   help="core percentile of the radial distance "
                        "distribution mapped to the grid")
    p.add_argument("--norm-margin", type=float, default=1.15,
                   help="extent margin over the core percentile radius")
    p.add_argument("--norm-core-radius", type=float, default=0.9,
                   help="contraction: normalized radius the core "
                        "percentile lands at (inside the unit ball)")
    p.add_argument("--occupancy", action="store_true",
                   help="occupancy-pruned marching (dense/occupancy.py)")
    p.add_argument("--iso", type=float, default=0.0,
                   help="mesh: density iso level (0 = auto from the density distribution)")
    p.add_argument("--sparsity-sigma", type=float, default=0.0,
                   help="Cauchy density-sparsity prior weight (Plenoxels "
                        "sparsity loss; pairs with --sh-background)")
    p.add_argument("--sh-background", action="store_true",
                   help="learnable view-directional SH background (outdoor "
                        "sky; replaces the hard white background)")
    p.add_argument("--exposure", action="store_true",
                   help="per-train-image exposure latents (3 log-gains, "
                        "jointly optimized — outdoor auto-exposure varies "
                        "across views; see DenseConfig.exposure)")
    p.add_argument("--coarse-epochs", type=int, default=0,
                   help="coarse-to-fine: train this many epochs on a 2x-"
                        "downscaled grid first, then upsample and continue")
    p.add_argument("--hierarchical", action="store_true",
                   help="coarse->fine importance sampling in the dense stage")
    p.add_argument("--holdout-every", type=int, default=8,
                   help="hold out every k-th camera as a PSNR test view (0 = off)")
    p.add_argument("--max-eval-views", type=int, default=8)
    p.add_argument("--tv-sigma", type=float, default=0.0,
                   help="stochastic TV weight on the density channel")
    p.add_argument("--tv-sh", type=float, default=0.0,
                   help="stochastic TV weight on the SH color channels")
    p.add_argument("--grid-resolution", type=int, default=256,
                   help="dense voxel grid resolution per axis")
    p.add_argument("--aniso-grid", action="store_true",
                   help="densify: fit the grid box to the kept cloud's "
                        "normalized AABB with per-axis resolution at the "
                        "same voxel budget (elongated scenes waste a "
                        "third of a cube on empty margins)")
    p.add_argument("--coremax-q", type=float, default=80.0,
                   help="coremax normalization: radial percentile kept "
                        "(80 calibrated against the legacy framing; lower "
                        "= tighter crop = more voxels on the scene core)")
    p.add_argument("--detail-epochs", type=int, default=0,
                   help="densify cascade phase 2: train a residual DETAIL "
                        "grid over the kept cloud's box (contracted coords "
                        "under --contraction) against the frozen base for "
                        "this many epochs — ~1.5-2x voxels/unit in the "
                        "core, the single-chip capacity lift (r5)")
    p.add_argument("--detail-res", type=int, default=0,
                   help="voxel budget of the cascade detail grid "
                        "(0 = same as --grid-resolution)")
    p.add_argument("--camera-gate", action="store_true",
                   help="densify: after --camera-gate-epoch epochs, drop "
                        "train cameras whose probe loss is a robust "
                        "outlier (wrong-pose cameras the grid cannot fit; "
                        "decouples dense quality from sparse-tail cameras)")
    p.add_argument("--camera-gate-epoch", type=int, default=2)
    p.add_argument("--include-low-confidence", action="store_true",
                   help="densify: train on --register-all low-confidence "
                        "cameras too (excluded by default — their poses "
                        "are unverified chained guesses)")
    p.add_argument("--mesh", default="",
                   help="densify: train on a device mesh — 'auto' (all "
                        "devices as voxel bricks) or 'DPxMP' (e.g. 2x4: "
                        "ray batches over 2, grid bricks over 4). Per-"
                        "device grid memory is 1/MP — lifts the 256^3 "
                        "single-chip capacity ceiling (dist/dense_tp.py). "
                        "Composes with --distributed for multi-host.")
    p.add_argument("--dense-optimizer", choices=["adam", "rmsprop"],
                   default="adam",
                   help="grid optimizer (rmsprop keeps one moment buffer: "
                        "fits 320-352^3 where adam caps at 288^3)")
    p.add_argument("--scene-scale", type=float, default=0.0,
                   help="dense grid half-extent in normalized units. 0 = "
                        "auto: 1.0 under the gauge-invariant coremax/core "
                        "normalizations (all kept content fits the unit "
                        "box; measured +3 dB over 1.5), the reference's "
                        "1.5 (plenoxel.py:21) otherwise")
    p.add_argument("--num-samples", type=int, default=192,
                   help="ray-march samples per ray")
    p.add_argument("--rays-pkl", default="",
                   help="train dense stage from a reference-protocol (N,9) "
                        "ray pickle (sdf.py:420) instead of a reconstruction")
    p.add_argument("--test-rays-pkl", default="",
                   help="held-out (N,9) ray pickle for test PSNR")
    p.add_argument("--near", type=float, default=0.0,
                   help="override sampling band near (rays-pkl mode)")
    p.add_argument("--far", type=float, default=0.0,
                   help="override sampling band far (rays-pkl mode)")
    p.add_argument("--resume", action="store_true",
                   help="resume dense training from the saved checkpoint")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="skip grid/optimizer checkpoint downloads (minutes per epoch on the remote tunnel)")
    p.add_argument("--final-grid", action="store_true",
                   help="with --no-checkpoint: still save the FINAL "
                        "dense_grid (+detail) once training ends, so "
                        "--eval-only can score it from a fresh process")
    p.add_argument("--band-core-radius", type=float, default=0.0,
                   help="contraction: derive the uniform sampling band "
                        "from points within this normalized radius only "
                        "(0 = off) — counteracts drift-tail band dilation")
    p.add_argument("--detail-only", action="store_true",
                   help="densify: load the saved dense_grid as the frozen "
                        "cascade base and train ONLY the detail layer "
                        "(cascade process isolation — see --eval-only)")
    p.add_argument("--eval-only", action="store_true",
                   help="densify: skip training and evaluate the SAVED "
                        "dense_grid (+detail) in a fresh process — the "
                        "cascade's post-training eval can OOM on training "
                        "leftovers")
    p.add_argument("--render-views", default="0,60,120,180",
                   help="render: comma-separated registered-view indices "
                        "(the reference's plenoxel.py:134-135 test views); "
                        "'' to skip")
    p.add_argument("--orbit", type=int, default=0,
                   help="render: also render N novel views interpolated "
                        "along the registered trajectory")
    p.add_argument("--render-stride", type=int, default=1,
                   help="render: pixel stride (2 = half resolution)")
    p.add_argument("--ply", default="")
    p.add_argument("--out", default="",
                   help="export: destination dir (default ARTIFACTS/output)")
    p.add_argument("--mode", choices=["incremental", "global"], default="incremental")
    p.add_argument("--five-point", dest="five_point", action="store_true", default=True,
                   help="Nister 5-point minimal solver in the matching E-gate (default; planar-safe)")
    p.add_argument("--eight-point", dest="five_point", action="store_false",
                   help="cheaper 8-point E solver instead of the 5-point default")
    p.add_argument("--from-matches", action="store_true",
                   help="reconstruct from the saved matching artifacts (no re-matching)")
    p.add_argument("--overlap", action="store_true",
                   help="extract (multi-process): cross-host stage overlap "
                        "— workers publish batches, process 0 prematches "
                        "sequential edges during extraction (dist/overlap.py)")
    p.add_argument("--trace", default="",
                   help="write a Chrome-trace JSON of host-side stage/kernel "
                        "spans (load in chrome://tracing or Perfetto) and "
                        "print a span summary (utils/trace.py)")
    p.add_argument("--xprof", default="",
                   help="capture a jax.profiler device trace into this dir "
                        "(TensorBoard-loadable; includes XLA op timelines)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (useful off-TPU; the axon "
                        "sitecustomize overrides JAX_PLATFORMS so this must "
                        "be a jax.config update, not an env var)")
    p.add_argument("--distributed", default="",
                   help="join a multi-process group before any device use: "
                        "'auto' (cluster-env autodetect, multi-host TPU "
                        "slices) or 'COORD_HOST:PORT,NUM_PROCS,PROC_ID'. "
                        "TPU3D_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID env "
                        "vars work too (tpu3d/dist/runtime.py).")
    args = p.parse_args(argv)
    if args.command != "ingest" and not args.images:
        p.error("--images is required")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    if args.distributed or os.environ.get("TPU3D_COORDINATOR"):
        from tpu3d.dist import maybe_initialize_distributed

        if args.distributed == "auto":
            maybe_initialize_distributed(num_processes=-1)
        elif args.distributed:
            coord, nproc, pid = args.distributed.rsplit(",", 2)
            maybe_initialize_distributed(coord, int(nproc), int(pid))
        else:
            maybe_initialize_distributed()
    # Persistent XLA compilation cache: compiles are a per-deployment
    # one-off, not a per-scene cost (a single bundle-adjust executable
    # takes ~25 s to build over the remote-TPU tunnel). Safe to enable
    # unconditionally — backends that can't serialize just skip it.
    cache_dir = os.environ.get("TPU3D_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/tpu3d_xla"))
    if cache_dir and cache_dir != "0":
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            pass
    cmd = {
        "extract": cmd_extract,
        "match": cmd_match,
        "reconstruct": cmd_reconstruct,
        "densify": cmd_densify,
        "full": cmd_full,
        "export": cmd_export,
        "mesh": cmd_mesh,
        "render": cmd_render,
        "ingest": cmd_ingest,
    }[args.command]
    if args.xprof:
        import jax

        jax.profiler.start_trace(args.xprof)
    try:
        from tpu3d.utils.trace import get_tracer

        with get_tracer().span(args.command):
            cmd(args)
    finally:
        if args.xprof:
            import jax

            jax.profiler.stop_trace()
            print(f"device trace written to {args.xprof}", file=sys.stderr)
        if args.trace:
            tr = get_tracer()
            tr.export_chrome_trace(args.trace)
            print(json.dumps(tr.summary()), file=sys.stderr)


if __name__ == "__main__":
    main()
