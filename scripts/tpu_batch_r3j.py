"""Round-3 TPU batch J: final dense push for >= 19 dB.
  r3_cm_s1     the fresh 289-cam rec, coremax+s1, 6 epochs
  b_cm_s1_12   best-known rec at 12 epochs (schedule headroom probe)
then bench.py (256-hypothesis config) for the final r3 number.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3j +{time.time()-t0:.0f}s] {m}", flush=True)

BASE = ["--images", "/root/reference/ystad_kloster", "--no-checkpoint",
        "--ray-stride", "2", "--hierarchical", "--quiet",
        "--norm", "coremax", "--scene-scale", "1.0"]

DENSE = [
    ("r3dense_r3_cm_s1", ["--epochs", "6", "--coarse-epochs", "2"]),
    ("r3dense_b_cm_s1_12", ["--epochs", "12", "--coarse-epochs", "2"]),
]

def main():
    for name, extra in DENSE:
        stamp(f"densify {name} {extra}")
        try:
            cli.main(["densify", "--artifacts", f"artifacts/{name}", *BASE, *extra])
        except SystemExit as e:
            print(f"[r3j] {name} exited: {e}", flush=True)
        except Exception as e:
            print(f"[r3j] {name} FAILED: {type(e).__name__}: {e}", flush=True)
    stamp("bench.py final x2")
    import bench
    bench.main()
    bench.main()
    stamp("done")

if __name__ == "__main__":
    main()
