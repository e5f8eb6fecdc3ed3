"""Round-3 TPU batch F: dense normalization decision runs.

Batch C finding: the percentile-radius CROP (norm=core) loses 1.5 dB to
legacy on the same rec (content beyond the crop is unexplainable without
a background model). coremax = gauge-invariant relative filter + legacy
max-extent framing. Runs:
  b_coremax      collapsed-gauge rec, coremax         -> expect ~legacy 15.1, gauge-free
  c_coremax      r2 rec, coremax                      -> vs r2 legacy 16.64
  c_coremax_320  capacity ladder at coremax, 320^3
  c_scale1_bg    core crop + SH background + sparsity (crop-with-bg theory)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3f +{time.time()-t0:.0f}s] {m}", flush=True)

BASE = ["--images", "/root/reference/ystad_kloster", "--no-checkpoint",
        "--ray-stride", "2", "--hierarchical", "--quiet",
        "--epochs", "6", "--coarse-epochs", "2"]

RUNS = [
    ("r3dense_b_coremax", ["--norm", "coremax"]),
    ("r3dense_c_coremax", ["--norm", "coremax"]),
    ("r3dense_c_coremax_320", ["--norm", "coremax",
                               "--grid-resolution", "320"]),
    ("r3dense_c_scale1_bg", ["--norm", "core", "--scene-scale", "1.0",
                             "--sh-background", "--sparsity-sigma", "1e-5"]),
]

def main():
    for name, extra in RUNS:
        stamp(f"densify {name} {extra}")
        try:
            cli.main(["densify", "--artifacts", f"artifacts/{name}", *BASE, *extra])
        except SystemExit as e:
            print(f"[r3f] {name} exited: {e}", flush=True)
        except Exception as e:
            print(f"[r3f] {name} FAILED: {type(e).__name__}: {e}", flush=True)
    stamp("done")

if __name__ == "__main__":
    main()
