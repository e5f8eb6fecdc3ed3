"""Round-3 TPU batch G: final perf sweep + the coremax/scene-scale-1 dense
combo (under coremax ALL kept content lies within L-inf radius 1.0, so
the inherited scene_scale=1.5 wastes 1/3 of linear voxel resolution for
nothing — this is the crop win WITHOUT the crop fog)."""
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
        "--norm", "coremax", "--scene-scale", "1.0",
        "--epochs", "6", "--coarse-epochs", "2"]

DENSE = [
    ("r3dense_b_cm_s1", []),
    ("r3dense_c_cm_s1", []),
    ("r3dense_c_cm_s1_288", ["--grid-resolution", "288", "--epochs", "8"]),
    ("r3dense_c_cm_s1_352r", ["--grid-resolution", "352", "--epochs", "8",
                              "--dense-optimizer", "rmsprop"]),
]

def main():
    run_mod("r3_perf_probe", ["--variants=split2,hybrid"])
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
