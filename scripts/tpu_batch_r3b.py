"""Round-3 TPU batch B: sfm-backend placement A/B on the 24-image bench,
then the full-290 BA-cadence + recall experiments on identical saved
matches (artifacts/r3cad_*, symlinked to full290c's matches).

One process = one TPU-pool claim (ROUND1_NOTES).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3d import cli

t0 = time.time()


def stamp(msg):
    print(f"[r3b +{time.time() - t0:.0f}s] {msg}", flush=True)


def main():
    import importlib

    stamp("r3_perf_probe base vs sfmcpu")
    sys.argv = ["r3_perf_probe", "--variants=base,sfmcpu"]
    importlib.import_module("benchmarks.r3_perf_probe").main()

    stamp("bench.py")
    import bench

    bench.main()

    runs = [
        ("artifacts/r3cad_a", []),                       # default cadence
        ("artifacts/r3cad_b", ["--global-ba-every", "1000000"]),  # windowed-only
        ("artifacts/r3cad_c", ["--global-ba-growth", "1.3"]),
    ]
    for art, extra in runs:
        stamp(f"reconstruct {art} {extra}")
        cli.main(["reconstruct", "--images", "/root/reference/ystad_kloster",
                  "--artifacts", art, "--from-matches", "--quiet", *extra])
    stamp("done")


if __name__ == "__main__":
    main()
