"""Round-3 TPU batch D: hybrid-placement bench + full-290 hybrid recall run."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3d +{time.time()-t0:.0f}s] {m}", flush=True)

def main():
    import importlib
    stamp("r3_perf_probe hybrid x2")
    sys.argv = ["r3_perf_probe", "--variants=hybrid,hybrid"]
    importlib.import_module("benchmarks.r3_perf_probe").main()
    stamp("bench.py (hybrid default)")
    import bench
    bench.main()
    stamp("full-290 hybrid reconstruct (r3cad_d)")
    cli.main(["reconstruct", "--images", "/root/reference/ystad_kloster",
              "--artifacts", "artifacts/r3cad_d", "--from-matches",
              "--sfm-backend", "hybrid", "--quiet"])
    stamp("done")

if __name__ == "__main__":
    main()
