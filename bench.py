"""Benchmark: end-to-end incremental SfM on a fixed ystad_kloster subset.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": R, ...}

vs_baseline = baseline_seconds / our_seconds (>1 == faster than baseline).
The baseline is the reference-equivalent CPU pipeline measured by
baselines/reference_like.py on identical inputs (the reference itself
cannot run here: its learned frontend needs undownloadable checkpoints —
see BASELINE.md). Same subset, same downscale, same focal model.

Steady-state methodology: all jitted kernels are pre-warmed on dummy
buffers of the benchmark shapes before the clock starts — compile time is
a one-off per deployment, not part of per-scene reconstruction cost.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_IMAGES = 24
DOWNSCALE = 2
DATASET = "/root/reference/ystad_kloster"

# Measured by `python baselines/reference_like.py 24 2` on this machine's
# CPU (see BASELINE.md): cv2 SIFT + BF matching + cv2 SfM + scipy BA.
BASELINE_SECONDS = 4.92
BASELINE_MEAN_REPROJ_PX = 4.56
BASELINE_REGISTERED = 24


def prewarm(cfg, H, W):
    """Compile every per-pair kernel on dummy data of benchmark shapes."""
    import jax
    import jax.numpy as jnp

    from tpu3d.features import extract_features
    from tpu3d.geometry.estimators import find_essential_ransac
    from tpu3d.geometry.pnp import pnp_ransac
    from tpu3d.matching import match_descriptors
    from tpu3d.matching.bow import build_codebook
    from tpu3d.sfm.engine import _triangulate_and_gate

    B = cfg.frontend.batch_size
    K = cfg.frontend.max_keypoints
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    fs = extract_features(img, cfg.frontend)
    d = jnp.asarray(rng.normal(0, 1, (K, 128)).astype(np.float32))
    v = jnp.ones((K,), jnp.float32)
    match_descriptors(d, d, v, v, ratio=cfg.matching.ratio_threshold)
    uv = jnp.asarray(rng.uniform(-300, 300, (K, 2)).astype(np.float32))
    find_essential_ransac(
        jax.random.PRNGKey(0), uv, uv, v, cfg.camera.focal_length,
        threshold_px=cfg.matching.ransac_threshold_px,
        num_hypotheses=cfg.sfm.ransac.num_hypotheses,
    )
    X = jnp.asarray(rng.uniform(-1, 1, (K, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    pnp_ransac(jax.random.PRNGKey(0), X, uv / cfg.camera.focal_length, v,
               (2.0 / cfg.camera.focal_length) ** 2,
               num_hypotheses=cfg.sfm.ransac.num_hypotheses // 2)
    _triangulate_and_gate(jnp.zeros(6), jnp.ones(6) * 0.1, uv / cfg.camera.focal_length,
                          uv / cfg.camera.focal_length, cfg.camera.focal_length, 2.0)
    build_codebook(jax.random.PRNGKey(0),
                   jnp.asarray(rng.normal(0, 1, (N_IMAGES, K, 128)).astype(np.float32)),
                   jnp.ones((N_IMAGES, K)), cfg.retrieval.codebook_size,
                   cfg.retrieval.kmeans_iters)


# TPU v5e (1 chip) peak: 197 TFLOP/s bf16 on the MXU; f32 work runs as
# multi-pass bf16 (Precision.HIGHEST ~ 1/6 of bf16 peak). MFU is reported
# against the bf16 peak so the number states plainly what fraction of the
# chip the stage achieves, with the precision caveat in the field name.
_V5E_PEAK_BF16 = 197e12


def _barrier(tree):
    """Materialize on host. block_until_ready returns EARLY on the axon
    remote backend (BASELINE.md link facts) — a real device_get is the only
    trustworthy barrier."""
    import jax

    return jax.tree_util.tree_map(
        lambda a: (np.asarray(jax.device_get(a.ravel()[:1]))
                   if hasattr(a, "shape") else a), tree)


def _mfu_entry(fn, args, kwargs=None, reps: int = 3, calls: int = 2):
    """(flops/call from XLA cost analysis, best seconds/call) for a jitted
    fn at fixed shapes. Pallas custom calls count 0 FLOPs in XLA's
    analysis — entries dominated by Pallas kernels report flops=None.

    When the live backend's compile gives no flop count (the axon remote
    compile path does not expose cost analysis for some programs —
    mfu.extract_batch was blank in r3/r4), the count is re-derived from a
    HOST-CPU lowering of the same function at the same shapes: the
    arithmetic is backend-independent to first order, and the entry is
    tagged flops_source="cpu_lowering" for honesty."""
    import jax

    kwargs = kwargs or {}
    flops_source = "device"
    try:
        ca = fn.lower(*args, **kwargs).compile().cost_analysis()
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        flops = None
    if flops is None:
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                cargs = jax.tree_util.tree_map(
                    lambda a: (jax.device_put(np.asarray(a), cpu)
                               if hasattr(a, "shape") else a), args)
                ca = fn.lower(*cargs, **kwargs).compile().cost_analysis()
            flops = float(ca.get("flops", 0.0)) or None
            flops_source = "cpu_lowering"
        except Exception:
            flops = None
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(calls):
            out = fn(*args, **kwargs)
        _barrier(out)
        best = min(best, (time.time() - t0) / calls)
    return flops, best, flops_source


def measure_mfu(cfg, H, W):
    """Achieved-FLOPs report for the per-stage hot kernels at bench shapes
    (VERDICT r2 #6: wall-clock alone can't answer 'is extract 2.94 s
    good?'). Keys mirror the stage names in stage_seconds."""
    import jax
    import jax.numpy as jnp

    from tpu3d.features import extract_features
    from tpu3d.geometry.estimators import find_essential_ransac
    from tpu3d.geometry.pnp import pnp_ransac
    from tpu3d.matching import match_descriptors

    B = cfg.frontend.batch_size
    K = cfg.frontend.max_keypoints
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (K, 128)).astype(np.float32))
    v = jnp.ones((K,), jnp.float32)
    uv = jnp.asarray(rng.uniform(-300, 300, (K, 2)).astype(np.float32))
    X = jnp.asarray(rng.uniform(-1, 1, (K, 3)).astype(np.float32)
                    + np.array([0, 0, 5], np.float32))
    # extract_features is a python wrapper (precision scoping + dtype
    # dispatch), not a jitted fn — it has no .lower, so BOTH cost-analysis
    # paths threw and the flops fallback never ran (the r3/r4 blank-row
    # mystery). A jit-wrapped closure restores .lower for cost analysis;
    # runtime numbers are unchanged (same underlying executable).
    extract_jit = jax.jit(lambda im: extract_features(im, cfg.frontend))
    entries = {
        "extract_batch": (extract_jit, (img,), None),
        "match_pair": (match_descriptors, (d, d, v, v),
                       {"ratio": cfg.matching.ratio_threshold}),
        "essential_gate": (find_essential_ransac,
                           (jax.random.PRNGKey(0), uv, uv, v,
                            cfg.camera.focal_length),
                           {"threshold_px": cfg.matching.ransac_threshold_px,
                            "num_hypotheses": cfg.sfm.ransac.num_hypotheses}),
        "pnp": (pnp_ransac,
                (jax.random.PRNGKey(0), X, uv / cfg.camera.focal_length, v,
                 (2.0 / cfg.camera.focal_length) ** 2),
                {"num_hypotheses": cfg.sfm.ransac.num_hypotheses // 2}),
    }
    report = {}
    for name, (fn, args, kwargs) in entries.items():
        flops, secs, src = _mfu_entry(fn, args, kwargs)
        row = {"seconds_per_call": round(secs, 4)}
        if flops:
            row["gflops_per_call"] = round(flops / 1e9, 2)
            row["achieved_gflops_per_s"] = round(flops / secs / 1e9, 1)
            row["pct_of_v5e_bf16_peak"] = round(100 * flops / secs / _V5E_PEAK_BF16, 2)
            if src != "device":
                row["flops_source"] = src
        report[name] = row
    return report


def bench_config():
    """The benchmark PipelineConfig (also consumed by
    benchmarks/r3_perf_probe.py for knob variants)."""
    from tpu3d.config import (
        CameraConfig, FrontendConfig, MatchingConfig, PipelineConfig,
        RansacConfig, SfMConfig,
    )

    focal = 2378.98305085 / DOWNSCALE
    return PipelineConfig(
        camera=CameraConfig(focal_length=focal),
        frontend=FrontendConfig(max_keypoints=2048, batch_size=4),
        # pair_batch 32: 64 measured worse end-to-end at 159 edges (33 dead
        # padded slots in the last block cost more than the per-block RTT
        # the bigger batch saves).
        matching=MatchingConfig(min_raw_matches=100, pair_batch=32),
        sfm=SfMConfig(
            camera=CameraConfig(focal_length=focal),
            max_tracks=300_000,
            # 256 hypotheses: at 128, one marginal edge ((3,22): 9/298
            # E-inliers, one below the gate) deterministically failed on
            # TPU-extracted features after the r3 blur change, costing a
            # camera AND ~2.5 s of fixpoint retries; 256 restores
            # 24/24 @ 0.402 px for ~0.1 s of gate work. The full-dataset
            # default stays 512 for wide-baseline retrieval edges.
            # 8-point-only gate on this subset: CPU A/B five on/off ->
            # 0.877/0.752 px (both 24/24) at ~half the gate compute; the
            # 5-point gate's edge pruning only pays off on wide-baseline
            # retrieval edges of the full dataset (BASELINE.md).
            # register_batch stays 8: 16 was quality-neutral on CPU but
            # TPU-measured pnp time ROSE 0.99 -> 1.56 s (chunk staleness
            # means more fixpoint retry rounds, each a full dispatch).
            ransac=RansacConfig(num_hypotheses=256, use_five_point=False),
            # At this scale the final-only global BA alone reaches the same
            # optimum: CPU A/B with/without per-chunk local BA = 0.397 vs
            # 0.391 px, both 24/24 — local BA is pure dispatch overhead here.
            run_pair_ba=False,
            # At 24 images the per-chunk local BA (window 25) already spans
            # the whole scene, so mid-run global BAs are pure dispatch
            # overhead: A/B'd identical quality (24/24 @ 0.404 px CPU,
            # final-only) vs every-8 (0.405 px) at 4x fewer BA calls.
            global_ba_every=1_000_000,
            # Latency-aware placement (r3): the per-image register steps
            # are ~10 ms of compute behind ~67 ms of tunnel round trip
            # each — they run on the host CPU; the global BA solve (real
            # throughput work) stays on the TPU. Measured 6.98 -> 5.43 s
            # with backend="cpu"; hybrid additionally keeps the BA's
            # 0.25 s TPU advantage.
            backend="hybrid",
        ),
    )


def measure_rtt(reps: int = 12) -> float:
    """Median seconds for one minimal dispatch + host fetch — the per-
    round-trip floor every host-blocking device call pays. On the remote
    tunnel this is ~67 ms; dispatch counts x this number is the latency
    bound the dispatches section makes auditable."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))


# Stage -> dispatch-counter phases that pay a device round trip in that
# stage. Under backend="hybrid" the register-path phases (pnp_chunk,
# pnp_single, triangulate, local_ba) run on the HOST CPU — their per-call
# overhead is ~ms, not the tunnel RTT — so they are listed separately.
_STAGE_PHASES = {
    "extract": ("extract_batch", "extract_bulk_fetch"),
    "retrieve": ("retrieve",),
    "match": ("match_block", "match_single"),
    "reconstruct": ("gba_mask_fetch", "gba_commit"),
}
_CPU_SIDE_PHASES = ("pnp_chunk", "pnp_single", "triangulate", "local_ba")


def dispatch_report(counts, timings, rtt, sfm_backend="hybrid"):
    """Per-stage dispatch counts + the RTT-vs-compute split VERDICT r3 #3
    asked for: rtt_bound_s = dispatches x measured RTT; compute_s = stage
    wall minus that. A stage whose compute_s ~ 0 is pure latency — the
    fix is fewer dispatches, not faster kernels."""
    from tpu3d.config import resolve_sfm_backend

    hybrid = resolve_sfm_backend(sfm_backend) in ("hybrid", "cpu")
    out = {"rtt_floor_s": round(rtt, 4), "counts": dict(counts)}
    for stage, phases in _STAGE_PHASES.items():
        n = sum(counts.get(p, 0) for p in phases)
        extra = 0
        if stage == "reconstruct" and not hybrid:
            extra = sum(counts.get(p, 0) for p in _CPU_SIDE_PHASES)
        wall = float(timings.get(stage, 0.0))
        rtt_bound = (n + extra) * rtt
        out[stage] = {
            "dispatches": n + extra,
            "rtt_bound_s": round(rtt_bound, 2),
            "compute_s": round(max(wall - rtt_bound, 0.0), 2),
        }
    if hybrid:
        out["cpu_side_calls"] = {p: counts.get(p, 0) for p in _CPU_SIDE_PHASES
                                 if counts.get(p, 0)}
    return out


def main():
    from tpu3d.io.images import list_images, load_images
    from tpu3d.sfm import pipeline as P
    from tpu3d.utils import dispatch as _disp

    # Persistent compile cache: pulls the cold pass toward the steady pass
    # across bench invocations (same mechanism the CLI stages use).
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tpu3d_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = bench_config()
    names = list_images(DATASET)[:N_IMAGES]
    g0, _ = load_images(DATASET, names[:1], DOWNSCALE)
    H, W = g0.shape[1:]

    t0 = time.time()
    prewarm(cfg, H, W)
    warmup_s = time.time() - t0

    # Pass 1 is the cold pass: it absorbs remaining compiles AND — on this
    # shared remote-TPU pool — multi-minute device re-claim stalls that can
    # strike at any dispatch. Pass 2 is the steady-state measurement
    # (deterministic pipeline: both passes produce identical outputs).
    t0 = time.time()
    rec, timings_cold = P.reconstruct(DATASET, cfg, names=names, downscale=DOWNSCALE, verbose=False)
    cold_total = time.time() - t0
    _disp.reset()
    t0 = time.time()
    rec, timings = P.reconstruct(DATASET, cfg, names=names, downscale=DOWNSCALE, verbose=False)
    total = time.time() - t0
    disp_counts = _disp.snapshot()

    out = {
        "metric": "ystad_kloster_24img_e2e_reconstruction_time",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / total, 3),
        "registered_cameras": len(rec.registered),
        "points": int(len(rec.points)),
        "mean_reproj_px": round(float(rec.mean_reproj_px), 3),
        "quality_vs_baseline": round(BASELINE_MEAN_REPROJ_PX / max(float(rec.mean_reproj_px), 1e-6), 2),
        "baseline": {
            "seconds": BASELINE_SECONDS,
            "registered": BASELINE_REGISTERED,
            "mean_reproj_px": BASELINE_MEAN_REPROJ_PX,
            "source": "baselines/reference_like.py (cv2 SIFT + cv2 SfM, CPU)",
        },
        "stage_seconds": {k: round(v, 2) for k, v in timings.items()},
        "sfm_phase_seconds": P.LAST_SFM_TIMERS,
        "match_phase_seconds": P.LAST_MATCH_TIMERS,
        "cold_pass_seconds": round(cold_total, 2),
        "warmup_compile_seconds": round(warmup_s, 1),
        "dispatches": dispatch_report(disp_counts, timings, measure_rtt(),
                                      cfg.sfm.backend),
        "mfu": measure_mfu(cfg, H, W),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
