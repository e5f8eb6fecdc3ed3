"""One-process TPU measurement session (single shared-pool claim):

  1. extractor timing at batch 4 and 8 (new merged-frontend flow)
  2. detect/descriptor sub-phase split
  3. full bench.py main() (24-image e2e vs CPU baseline)

Usage: python benchmarks/tpu_session.py [--skip-bench] [--skip-probe]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fetch(out):
    """Force completion: device->host fetch of one element per leaf.
    (block_until_ready on the remote axon backend returns early; an actual
    transfer is the only reliable completion barrier.)"""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            # One executable produces all outputs together; the last leaf's
            # availability implies the whole program finished.
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:1]))
            break


def _bench(fn, *args, reps=5):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        _fetch(fn(*args))
    return (time.time() - t0) / reps


def probe_rtt():
    """Per-execute overhead floor of the remote backend."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(jnp.zeros((8,), jnp.float32)))
    t0 = time.time()
    for i in range(10):
        np.asarray(f(jnp.full((8,), float(i), jnp.float32)))
    print(f"[probe] trivial execute round trip: {(time.time() - t0) / 10 * 1e3:.1f} ms",
          flush=True)

    # Host<->device link bandwidth (the tunnel, not PCIe).
    mb = 8
    big = np.ones((mb << 20) // 4, np.float32)
    jnp.asarray(big)[:1].block_until_ready()
    t0 = time.time()
    for _ in range(3):
        np.asarray(jax.device_get(jnp.asarray(big)[:8]))  # force upload
    up = mb * 3 / (time.time() - t0)
    dev = f(jnp.asarray(big))
    np.asarray(jax.device_get(dev[:8]))
    t0 = time.time()
    for _ in range(3):
        np.asarray(jax.device_get(dev))
    down = mb * 3 / (time.time() - t0)
    print(f"[probe] link bandwidth: upload ~{up:.1f} MB/s, download ~{down:.1f} MB/s",
          flush=True)


def probe_match():
    import jax
    import jax.numpy as jnp

    from tpu3d.sfm.pipeline import _match_and_gate_block

    K, D, N_IMG = 2048, 128, 40
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(0, 1, (N_IMG, K, D)).astype(np.float32))
    v = jnp.ones((N_IMG, K), jnp.float32)
    kp = jnp.asarray(rng.uniform(-300, 300, (N_IMG, K, 2)).astype(np.float32))
    focal, thr, ratio = 1189.0, 1.0, 0.95
    for hyp in (128,):
        for B in (32,):
            ii = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
            jj = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
            kb = jax.random.split(jax.random.PRNGKey(0), B)
            np.asarray(_match_and_gate_block(d, v, kp, ii, jj, kb, focal, thr,
                                             ratio, hyp, five_point=True))
            times = []
            for r in range(3):
                ii = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
                jj = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
                kb = jax.random.split(jax.random.PRNGKey(r + 1), B)
                t0 = time.time()
                np.asarray(_match_and_gate_block(d, v, kp, ii, jj, kb, focal,
                                                 thr, ratio, hyp,
                                                 five_point=True))
                times.append(time.time() - t0)
            best = min(times)
            print(f"[probe] match block hyp={hyp} B={B}: {best:.3f} s "
                  f"({best / B * 1e3:.1f} ms/edge)", flush=True)


def probe():
    import jax
    import jax.numpy as jnp

    from tpu3d.config import FrontendConfig
    from tpu3d.features import extract_features
    from tpu3d.features.detector import detect_octave
    from tpu3d.features.pyramid import build_pyramid

    H, W = 648, 968
    rng = np.random.default_rng(0)
    B = 4
    img = (rng.uniform(0, 1, (B, H, W)) * 255).astype(np.uint8)
    for fused in (True, False):
        cfg = FrontendConfig(batch_size=B, fused_descriptor=fused)
        try:
            t = _bench(lambda x: extract_features(x, cfg), jnp.asarray(img))
            print(f"[probe] extract fused={fused}: {t * 1e3:7.1f} ms/batch "
                  f"({t / B * 1e3:.0f} ms/img)", flush=True)
        except Exception as e:
            print(f"[probe] extract fused={fused}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    cfg = FrontendConfig()
    S = cfg.scales_per_octave
    img4 = jnp.asarray(rng.uniform(0, 1, (4, H, W)).astype(np.float32))

    @jax.jit
    def f_pyr(x):
        with jax.default_matmul_precision("float32"):
            return build_pyramid(x, cfg.num_octaves, S, cfg.sigma0)

    t = _bench(f_pyr, img4)
    print(f"[probe] pyramid: {t * 1e3:7.1f} ms/batch", flush=True)
    gauss, dogs = f_pyr(img4)

    import functools

    @functools.partial(jax.jit, static_argnames=("o",))
    def f_det(dog, o=0):
        with jax.default_matmul_precision("float32"):
            return detect_octave(dog, cfg.max_keypoints, cfg.contrast_threshold,
                                 cfg.edge_threshold, cfg.nms_radius)

    tdet = 0.0
    for o in range(cfg.num_octaves):
        tdet += _bench(functools.partial(f_det, o=o), dogs[o])
    print(f"[probe] detect (all octaves, dense subpixel): {tdet * 1e3:7.1f} ms/batch",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()
    t0 = time.time()
    if not args.skip_probe:
        probe_rtt()
        probe()
        probe_match()
        print(f"[session] probe done +{time.time() - t0:.0f}s", flush=True)
    if not args.skip_bench:
        import bench

        bench.main()
        print(f"[session] bench done +{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
