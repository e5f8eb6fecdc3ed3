"""Round-3 TPU batch G: final perf sweep + the calibrated dense configs.

Radial-structure finding (r3f forensics): the ystad clouds are a tiny
core (p50 ~ 7 units) plus a massive drift shell (p90 ~ 330, max ~ 16k on
the 287-cam rec); the legacy filter acted as a ~p80 radial crop, and
every normalization question is really "how much shell to crop vs fog".
coremax is now calibrated to q80/k1. Runs:
  perf: split2 + hybrid probe, bench x2, phase probe, kernel benches
  c_cm_s1 / b_cm_s1      coremax(q80) + scene_scale 1.0, 256^3
  c_cm_s1_288            the capacity combo, 288^3, 8 epochs
  c_contract70_288       contraction with core_q 70 (r2's q90 put the
                         p50-core at radius 0.02 - useless by construction)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3g +{time.time()-t0:.0f}s] {m}", flush=True)

def run_mod(name, argv):
    import importlib
    stamp(f"{name} {argv}")
    sys.argv = [name] + argv
    try:
        importlib.import_module(f"benchmarks.{name}").main()
    except Exception as e:
        print(f"[r3g] {name} FAILED: {type(e).__name__}: {e}", flush=True)

def _recover_device():
    try:
        import jax
        for a in jax.live_arrays():
            try: a.delete()
            except Exception: pass
        jax.clear_caches()
    except Exception:
        pass

BASE = ["--images", "/root/reference/ystad_kloster", "--no-checkpoint",
        "--ray-stride", "2", "--hierarchical", "--quiet",
        "--epochs", "6", "--coarse-epochs", "2"]
CM = ["--norm", "coremax", "--scene-scale", "1.0"]

DENSE = [
    ("r3dense_c_cm_s1", CM),
    ("r3dense_b_cm_s1", CM),
    ("r3dense_c_cm_s1_288", CM + ["--grid-resolution", "288", "--epochs", "8"]),
    ("r3dense_c_contract70_288", ["--contraction", "--norm-core-q", "70",
                                  "--grid-resolution", "288"]),
]

def main():
    stamp("bench.py x2")
    import bench
    bench.main()
    bench.main()
    run_mod("extract_phase_probe2", [])
    run_mod("trilinear_bench", [])
    run_mod("kernel_bench", [])
    for name, extra in DENSE:
        stamp(f"densify {name} {extra}")
        try:
            cli.main(["densify", "--artifacts", f"artifacts/{name}", *BASE, *extra])
        except SystemExit as e:
            print(f"[r3g] {name} exited: {e}", flush=True)
        except Exception as e:
            print(f"[r3g] {name} FAILED: {type(e).__name__}: {e}", flush=True)
            _recover_device()
    stamp("done")

if __name__ == "__main__":
    main()
