"""Round-3 bench knob A/B: patch-matmul precision and approx-top-k
detector selection on the 24-image e2e workload (VERDICT r2 #1).

Runs the full reconstruct for each variant (steady-state second pass) and
prints one JSON line per variant with time, phase split, and quality — the
decision data for flipping bench defaults.

Usage: python benchmarks/r3_perf_probe.py [--variants base,prec,topk,both]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant_cfg(cfg, name):
    fe = cfg.frontend
    if name == "prec":
        fe = dataclasses.replace(fe, patch_precision="default")
    elif name == "topk":
        fe = dataclasses.replace(fe, approx_topk_recall=0.95)
    elif name == "both":
        fe = dataclasses.replace(fe, patch_precision="default",
                                 approx_topk_recall=0.95)
    elif name == "sfmcpu":
        return dataclasses.replace(
            cfg, sfm=dataclasses.replace(cfg.sfm, backend="cpu"))
    elif name == "hybrid":
        return dataclasses.replace(
            cfg, sfm=dataclasses.replace(cfg.sfm, backend="hybrid"))
    elif name == "split2":
        # 2-pass hi/lo bf16 patch sampling (kernels/patch_sample.py):
        # ~1/3 the MXU work of HIGHEST at ~2^-9 weight quantization.
        fe = dataclasses.replace(fe, patch_precision="split2")
        return dataclasses.replace(
            cfg, frontend=fe,
            sfm=dataclasses.replace(cfg.sfm, backend="hybrid"))
    elif name == "oprec":
        # Orientation-pass-only bf16: the histogram peak tolerates ~1e-2
        # sample noise; descriptor values keep f32.
        fe = dataclasses.replace(fe, orient_precision="default")
        return dataclasses.replace(
            cfg, frontend=fe,
            sfm=dataclasses.replace(cfg.sfm, backend="hybrid"))
    elif name.startswith("rb"):
        # register_batch sweep under hybrid placement: CPU-side retries
        # are cheap (no tunnel RTT), so bigger chunks may now win where
        # they lost on the TPU backend.
        return dataclasses.replace(
            cfg, sfm=dataclasses.replace(cfg.sfm, backend="hybrid",
                                         register_batch=int(name[2:])))
    elif name == "batch8":
        # The old batch-8 blocker (TPU scalar register allocator on the
        # descriptor gather graph) predates the dense-subpixel/Pallas
        # restructure — retest at the new graph.
        fe = dataclasses.replace(fe, batch_size=8)
    elif name == "prematch":
        return dataclasses.replace(
            cfg, matching=dataclasses.replace(cfg.matching, prematch=True))
    return dataclasses.replace(cfg, frontend=fe)


def main():
    import bench
    from tpu3d.io.images import list_images
    from tpu3d.sfm import pipeline as P

    names = list_images(bench.DATASET)[: bench.N_IMAGES]
    variants = ["base", "prec", "topk", "both"]
    for a in sys.argv[1:]:
        if a.startswith("--variants"):
            variants = a.split("=", 1)[1].split(",")
    base_cfg = bench.bench_config()
    for name in variants:
        cfg = variant_cfg(base_cfg, name)
        # pass 1 absorbs variant-specific compiles; pass 2 is the number
        rec, _ = P.reconstruct(bench.DATASET, cfg, names=names,
                               downscale=bench.DOWNSCALE, verbose=False)
        t0 = time.time()
        rec, timings = P.reconstruct(bench.DATASET, cfg, names=names,
                                     downscale=bench.DOWNSCALE, verbose=False)
        total = time.time() - t0
        print(json.dumps({
            "variant": name,
            "seconds": round(total, 2),
            "vs_baseline": round(bench.BASELINE_SECONDS / total, 3),
            "registered": len(rec.registered),
            "mean_reproj_px": round(float(rec.mean_reproj_px), 3),
            "stage_seconds": {k: round(v, 2) for k, v in timings.items()},
            "sfm_phase_seconds": P.LAST_SFM_TIMERS,
            "match_phase_seconds": P.LAST_MATCH_TIMERS,
        }), flush=True)


if __name__ == "__main__":
    main()
