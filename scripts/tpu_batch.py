"""One-process TPU batch: full incremental reconstruction from saved
matches, then dense training + held-out eval on its output.

Why one process: the shared TPU pool charges a multi-minute device-claim
stall per process (ROUND1_NOTES.md); chaining CLI commands in-process
pays it once.

Usage: python scripts/tpu_batch.py [--artifacts artifacts/full290]
       [--skip-reconstruct] [--epochs 3] [--occupancy] [--hierarchical]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3d import cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/ystad_kloster")
    ap.add_argument("--artifacts", default="artifacts/full290")
    ap.add_argument("--skip-reconstruct", action="store_true")
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--ray-stride", type=int, default=2)
    ap.add_argument("--occupancy", action="store_true")
    ap.add_argument("--hierarchical", action="store_true")
    ap.add_argument("--mode", default="incremental")
    ap.add_argument("--model", default="plenoxel", choices=["plenoxel", "sdf"])
    args = ap.parse_args()

    base = ["--images", args.images, "--artifacts", args.artifacts]
    if not args.skip_reconstruct:
        cli.main(["reconstruct", *base, "--from-matches", "--mode", args.mode])
    if not args.skip_dense:
        dense = ["densify", *base, "--epochs", str(args.epochs),
                 "--ray-stride", str(args.ray_stride), "--no-checkpoint",
                 "--model", args.model]
        if args.occupancy:
            dense.append("--occupancy")
        if args.hierarchical:
            dense.append("--hierarchical")
        cli.main(dense)


if __name__ == "__main__":
    main()
