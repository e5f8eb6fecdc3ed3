"""Round-3 TPU batch C: dense-stage experiments (VERDICT r2 #2/#7).

All runs share the round-2 reconstructions via symlinked artifact dirs:
  full290b = CPU reconstruction, 287 cams (the gauge that collapsed to
             14.9 dB under the legacy normalization)
  full290c = TPU reconstruction, 277 cams (r2 plain recipe: 16.64 dB)

Experiments:
  b_core     gauge-invariant norm on the collapsed gauge  -> recovery?
  b_legacy   legacy norm control on the same rec          -> ~14.9 dB
  c_core     gauge-invariant norm on the r2 rec           -> vs 16.64
  c_contract contraction retune: 320^3, larger core
  c_320      capacity ladder: plain 320^3, longer schedule (blur diag)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3d import cli

t0 = time.time()


def stamp(msg):
    print(f"[r3c +{time.time() - t0:.0f}s] {msg}", flush=True)


BASE = ["--images", "/root/reference/ystad_kloster", "--no-checkpoint",
        "--ray-stride", "2", "--hierarchical", "--quiet"]

RUNS = [
    ("r3dense_b_core", ["--epochs", "6", "--coarse-epochs", "2"]),
    ("r3dense_b_legacy", ["--epochs", "6", "--coarse-epochs", "2",
                          "--norm", "legacy"]),
    ("r3dense_c_core", ["--epochs", "6", "--coarse-epochs", "2"]),
    ("r3dense_c_contract", ["--epochs", "6", "--coarse-epochs", "2",
                            "--contraction", "--grid-resolution", "320",
                            "--norm-core-q", "90"]),
    ("r3dense_c_320", ["--epochs", "8", "--coarse-epochs", "2",
                       "--grid-resolution", "320"]),
    # aux A/B at the full training config (same rec + recipe as c_core):
    # VERDICT r2 #5 acceptance = >= 0.8x plain throughput AND >= +0.3 dB,
    # else defaults stay off with the measurement recorded. aux_profile
    # showed no step-level gap — this isolates the loop-level one.
    ("r3dense_c_aux", ["--epochs", "6", "--coarse-epochs", "2",
                       "--exposure", "--sh-background"]),
]


def main():
    for name, extra in RUNS:
        stamp(f"densify {name} {extra}")
        try:
            cli.main(["densify", "--artifacts", f"artifacts/{name}",
                      *BASE, *extra])
        except SystemExit as e:
            print(f"[r3c] {name} exited: {e}", flush=True)
        except Exception as e:
            print(f"[r3c] {name} FAILED: {type(e).__name__}: {e}", flush=True)
    stamp("done")


if __name__ == "__main__":
    main()
