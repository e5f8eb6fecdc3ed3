"""One-process TPU batch: full incremental reconstruction from saved
matches, then dense training + held-out eval on its output.

Why one process: the shared TPU pool charges a multi-minute device-claim
stall per process (ROUND1_NOTES.md); chaining CLI commands in-process
pays it once.

Usage: python scripts/tpu_batch.py [--artifacts artifacts/full290]
       [--bench] [--from-scratch] [--skip-reconstruct] [--epochs 3]
       [--occupancy] [--hierarchical] [--model plenoxel|sdf|both]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3d import cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/ystad_kloster")
    ap.add_argument("--artifacts", default="artifacts/full290")
    ap.add_argument("--bench", action="store_true",
                    help="run bench.py's main() first (24-image e2e timing)")
    ap.add_argument("--from-scratch", action="store_true",
                    help="run extract + match before reconstruct")
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--skip-reconstruct", action="store_true")
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--ray-stride", type=int, default=2)
    ap.add_argument("--occupancy", action="store_true")
    ap.add_argument("--hierarchical", action="store_true")
    ap.add_argument("--mode", default="incremental")
    ap.add_argument("--model", default="plenoxel",
                    choices=["plenoxel", "sdf", "both"])
    ap.add_argument("--coarse-epochs", type=int, default=0)
    ap.add_argument("--exposure", action="store_true",
                    help="per-train-image exposure latents in the dense stage")
    ap.add_argument("--sh-background", action="store_true",
                    help="learnable SH background in the dense stage")
    ap.add_argument("--sparsity", type=float, default=0.0,
                    help="Cauchy density-sparsity prior weight")
    ap.add_argument("--contraction", action="store_true",
                    help="radial scene contraction in the dense stage")
    ap.add_argument("--r3-probe", action="store_true",
                    help="run benchmarks/r3_perf_probe.py (bench knob A/B)")
    ap.add_argument("--aux-profile", action="store_true",
                    help="run benchmarks/aux_profile.py (dense aux slowdown)")
    ap.add_argument("--learned-bench", action="store_true",
                    help="run benchmarks/learned_bench.py (DISK/LightGlue throughput)")
    ap.add_argument("--norm", default="coremax", choices=["coremax", "core", "legacy"],
                    help="dense scene normalization for densify")
    ap.add_argument("--norm-core-q", type=float, default=92.0)
    ap.add_argument("--norm-margin", type=float, default=1.15)
    ap.add_argument("--grid-resolution", type=int, default=256)
    ap.add_argument("--scene-scale", type=float, default=0.0)
    ap.add_argument("--num-samples", type=int, default=192)
    ap.add_argument("--global-ba-every", type=int, default=8)
    ap.add_argument("--global-ba-growth", type=float, default=1.12)
    ap.add_argument("--extract-probe", action="store_true",
                    help="run benchmarks/extract_probe.py first")
    ap.add_argument("--ba-bench", action="store_true",
                    help="run benchmarks/ba_bench.py first (BA solver + transfer probe)")
    ap.add_argument("--match-probe", action="store_true",
                    help="run benchmarks/match_block_probe.py first")
    ap.add_argument("--tv", default="",
                    help="extra plenoxel run with 'sigma,sh' TV weights")
    args = ap.parse_args()

    def stamp(msg):
        print(f"[tpu_batch +{time.time() - t0:.0f}s] {msg}", flush=True)

    t0 = time.time()
    base = ["--images", args.images, "--artifacts", args.artifacts]
    if args.ba_bench:
        stamp("ba_bench")
        import importlib

        sys.argv = ["ba_bench"]
        importlib.import_module("benchmarks.ba_bench").main()
    if args.match_probe:
        stamp("match_block_probe")
        import importlib

        sys.argv = ["match_block_probe"]
        importlib.import_module("benchmarks.match_block_probe").main()
    if args.extract_probe:
        stamp("extract_probe")
        import importlib

        sys.argv = ["extract_probe"]
        importlib.import_module("benchmarks.extract_probe").main()
        stamp("extract_phase_probe")
        sys.argv = ["extract_phase_probe"]
        importlib.import_module("benchmarks.extract_phase_probe").main()
    if args.r3_probe:
        stamp("r3_perf_probe")
        import importlib

        sys.argv = ["r3_perf_probe"]
        importlib.import_module("benchmarks.r3_perf_probe").main()
    if args.aux_profile:
        stamp("aux_profile")
        import importlib

        sys.argv = ["aux_profile"]
        importlib.import_module("benchmarks.aux_profile").main()
    if args.learned_bench:
        stamp("learned_bench")
        import importlib

        sys.argv = ["learned_bench"]
        importlib.import_module("benchmarks.learned_bench").main()
    if args.bench:
        stamp("bench.py")
        import bench

        bench.main()
    if args.from_scratch:
        stamp("extract")
        cli.main(["extract", *base, "--downscale", str(args.downscale)])
        stamp("match")
        cli.main(["match", *base])
    if not args.skip_reconstruct:
        stamp("reconstruct")
        cli.main(["reconstruct", *base, "--from-matches", "--mode", args.mode,
                  "--global-ba-every", str(args.global_ba_every),
                  "--global-ba-growth", str(args.global_ba_growth)])
    if not args.skip_dense:
        models = ["plenoxel", "sdf"] if args.model == "both" else [args.model]
        for model in models:
            stamp(f"densify {model}")
            dense = ["densify", *base, "--epochs", str(args.epochs),
                     "--ray-stride", str(args.ray_stride), "--no-checkpoint",
                     "--model", model,
                     "--coarse-epochs", str(args.coarse_epochs),
                     "--norm", args.norm,
                     "--norm-core-q", str(args.norm_core_q),
                     "--norm-margin", str(args.norm_margin),
                     "--grid-resolution", str(args.grid_resolution),
                     "--scene-scale", str(args.scene_scale),
                     "--num-samples", str(args.num_samples)]
            if args.occupancy:
                dense.append("--occupancy")
            if args.hierarchical:
                dense.append("--hierarchical")
            if args.exposure:
                dense.append("--exposure")
            if args.sh_background:
                dense.append("--sh-background")
            if args.sparsity:
                dense.extend(["--sparsity-sigma", str(args.sparsity)])
            if args.contraction:
                dense.append("--contraction")
            cli.main(dense)
        if args.tv:
            tv_s, tv_c = args.tv.split(",")
            stamp(f"densify plenoxel tv={args.tv}")
            dense = ["densify", *base, "--epochs", str(args.epochs),
                     "--ray-stride", str(args.ray_stride), "--no-checkpoint",
                     "--model", "plenoxel", "--tv-sigma", tv_s, "--tv-sh", tv_c]
            if args.occupancy:
                dense.append("--occupancy")
            if args.hierarchical:
                dense.append("--hierarchical")
            cli.main(dense)
    stamp("done")


if __name__ == "__main__":
    main()
