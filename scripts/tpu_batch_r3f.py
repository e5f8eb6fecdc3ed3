"""Round-3 TPU batch F: dense grid-extent crop A/B (scene_scale 1.0 under
the gauge-invariant core normalization — content fits radius ~1, the
reference's 1.5 wastes ~1/3 of linear voxel resolution)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3f +{time.time()-t0:.0f}s] {m}", flush=True)

BASE = ["--images", "/root/reference/ystad_kloster", "--no-checkpoint",
        "--ray-stride", "2", "--hierarchical", "--quiet",
        "--epochs", "6", "--coarse-epochs", "2", "--scene-scale", "1.0"]

RUNS = [
    ("r3dense_b_scale1", []),
    ("r3dense_c_scale1", []),
    ("r3dense_c_scale1_320", ["--grid-resolution", "320"]),
    ("r3dense_c_scale1_bg", ["--sh-background", "--sparsity-sigma", "1e-5"]),
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
