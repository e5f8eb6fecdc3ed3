"""Round-3 TPU batch F: dense normalization decision + capacity runs.

Batch C findings: percentile-radius CROP loses 1.3-1.5 dB to legacy on
both recs (unmodeled beyond-crop content); 320^3 Adam OOMs (4 buffers x
3.67 GB); an OOM poisons later in-process runs unless live buffers are
deleted. Runs (risky last):
  b_coremax      collapsed-gauge rec, coremax     -> expect ~15.1, gauge-free
  c_coremax      r2 rec, coremax                  -> vs r2 legacy 16.64
  c_aux2         coremax + exposure + SH bg       -> aux quality/throughput A/B
  c_coremax_288  capacity ladder at 288^3 (10.7 GB Adam fits), 8 epochs
  c_scale1_bg    core crop + scene_scale 1 + SH bg (crop-with-bg theory)
  c_contract_288 contraction retune at 288^3, core_q 90
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
    ("r3dense_c_aux2", ["--norm", "coremax", "--exposure", "--sh-background"]),
    ("r3dense_c_coremax_288", ["--norm", "coremax", "--grid-resolution",
                               "288", "--epochs", "8"]),
    ("r3dense_c_scale1_bg", ["--norm", "core", "--scene-scale", "1.0",
                             "--sh-background", "--sparsity-sigma", "1e-5"]),
    ("r3dense_c_contract_288", ["--contraction", "--grid-resolution", "288",
                                "--norm-core-q", "90"]),
]

def _recover_device():
    """Free every live buffer after a failed run — an OOM otherwise
    poisons the rest of the batch (observed in r3c)."""
    try:
        import jax
        for a in jax.live_arrays():
            try:
                a.delete()
            except Exception:
                pass
        jax.clear_caches()
    except Exception:
        pass

def main():
    for name, extra in RUNS:
        stamp(f"densify {name} {extra}")
        try:
            cli.main(["densify", "--artifacts", f"artifacts/{name}", *BASE, *extra])
        except SystemExit as e:
            print(f"[r3f] {name} exited: {e}", flush=True)
        except Exception as e:
            print(f"[r3f] {name} FAILED: {type(e).__name__}: {e}", flush=True)
            _recover_device()
    stamp("done")

if __name__ == "__main__":
    main()
