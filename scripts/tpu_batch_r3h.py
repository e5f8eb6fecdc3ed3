"""Round-3 TPU batch H: dense endgame.

State: coremax(q80) + scene_scale 1.0 recovered the collapsed gauge to
18.71 dB (best ever); the 2 dB b-vs-c spread is reconstruction
provenance. Runs (safest first; 288^3 needs rmsprop - Adam OOMs):
  d_cm_s1        densify the NEW 288-cam hybrid rec (0.449 px)
  c_contract70   contraction retune at 256^3, core_q 70
  d_aux          aux A/B on the winner config (VERDICT #5 acceptance)
  d_cm_s1_288r   288^3 rmsprop capacity run
Then a clean bench.py x2 with the 2.6x-faster extractor.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3h +{time.time()-t0:.0f}s] {m}", flush=True)

BASE = ["--images", "/root/reference/ystad_kloster", "--no-checkpoint",
        "--ray-stride", "2", "--hierarchical", "--quiet",
        "--epochs", "6", "--coarse-epochs", "2"]
CM = ["--norm", "coremax", "--scene-scale", "1.0"]

DENSE = [
    ("r3dense_d_cm_s1", CM),
    ("r3dense_c_contract70", ["--contraction", "--norm-core-q", "70"]),
    ("r3dense_d_aux", CM + ["--exposure", "--sh-background"]),
    ("r3dense_d_cm_s1_288r", CM + ["--grid-resolution", "288", "--epochs",
                                   "8", "--dense-optimizer", "rmsprop"]),
]

def main():
    stamp("bench.py x2 (new extractor)")
    import bench
    bench.main()
    bench.main()
    for name, extra in DENSE:
        stamp(f"densify {name} {extra}")
        try:
            cli.main(["densify", "--artifacts", f"artifacts/{name}", *BASE, *extra])
        except SystemExit as e:
            print(f"[r3h] {name} exited: {e}", flush=True)
        except Exception as e:
            print(f"[r3h] {name} FAILED: {type(e).__name__}: {e}", flush=True)
    stamp("done")

if __name__ == "__main__":
    main()
