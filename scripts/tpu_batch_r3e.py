"""Round-3 TPU batch E: extract phase split, register-batch sweep,
cadence-tuned full-290 hybrid, kernel %-peak numbers."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpu3d import cli

t0 = time.time()
def stamp(m): print(f"[r3e +{time.time()-t0:.0f}s] {m}", flush=True)

def run_mod(name, argv):
    import importlib
    stamp(f"{name} {argv}")
    sys.argv = [name] + argv
    importlib.import_module(f"benchmarks.{name}").main()

def main():
    run_mod("extract_phase_probe2", [])
    run_mod("extract_phase_probe2", ["--batch=8"])
    run_mod("r3_perf_probe", ["--variants=rb12,rb16,batch8,oprec"])
    stamp("bench.py")
    import bench
    bench.main()
    stamp("full-290 hybrid growth 1.2 (r3cad_e)")
    cli.main(["reconstruct", "--images", "/root/reference/ystad_kloster",
              "--artifacts", "artifacts/r3cad_e", "--from-matches",
              "--global-ba-growth", "1.2", "--quiet"])
    run_mod("trilinear_bench", [])
    run_mod("kernel_bench", [])
    stamp("done")

if __name__ == "__main__":
    main()
