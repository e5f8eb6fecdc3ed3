"""One-process TPU probe batch: bench.py + matching micro-bench + SDF
densify (packed path, band-consistent eval) — chained so the shared pool's
per-process claim stall is paid once."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def stamp(msg):
    print(f"[tpu_probe +{time.time() - t0:.0f}s] {msg}", flush=True)


stamp("bench.py")
import bench

bench.main()

stamp("match_bench")
sys.argv = ["match_bench"]
import importlib

mb = importlib.import_module("benchmarks.match_bench")
mb.main()

stamp("densify sdf (packed)")
from tpu3d import cli

cli.main([
    "densify", "--images", "/root/reference/ystad_kloster",
    "--artifacts", "artifacts/full290_5pt", "--epochs", "3",
    "--ray-stride", "2", "--no-checkpoint", "--model", "sdf",
])
stamp("done")
