"""Where do extraction's milliseconds go?

BENCH_r01 measured 6.85 s for 24 images (285 ms/img) against ~20 ms of
expected device compute — this probe splits one extraction run into its
host/device/link phases:

  decode     — JPEG load + downscale (host, thread pool)
  upload+run — jnp.asarray(uint8 batch) + extract dispatch (async)
  fetch_kp   — the per-batch keypoint download (blocking round trip)
  colors     — host-side color sampling
  bulk_fetch — final descriptor/valid download

plus a pure-dispatch loop (same batch re-extracted N times, fetch once) to
separate compute+RTT from the pipeline's serialization.

Usage: python benchmarks/extract_probe.py [--cpu] [--images N] [--batch B]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATASET = "/root/reference/ystad_kloster"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--downscale", type=int, default=2)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.config import FrontendConfig
    from tpu3d.features import extract_features
    from tpu3d.features.frontend import sample_colors
    from tpu3d.io.images import list_images, load_images

    cfg = FrontendConfig(batch_size=args.batch)
    names = list_images(DATASET)[: args.images]
    B = cfg.batch_size

    # Phase 1: decode all batches up front (timed separately).
    t0 = time.time()
    batches = []
    for s in range(0, len(names), B):
        chunk = names[s : s + B]
        gray, rgb = load_images(DATASET, chunk, args.downscale)
        pad = B - len(chunk)
        if pad:
            gray = np.concatenate([gray, np.repeat(gray[-1:], pad, 0)])
            rgb = np.concatenate([rgb, np.repeat(rgb[-1:], pad, 0)])
        batches.append((chunk, (gray * 255.0 + 0.5).astype(np.uint8), rgb))
    t_decode = time.time() - t0

    # Warm the executable.
    fs = extract_features(jnp.asarray(batches[0][1]), cfg)
    np.asarray(fs.keypoints_px)

    # Phase 2: dispatch all, then fetch all (maximum overlap).
    t0 = time.time()
    fss = [extract_features(jnp.asarray(g), cfg) for _, g, _ in batches]
    t_dispatch = time.time() - t0
    t0 = time.time()
    kps = [np.asarray(f.keypoints_px) for f in fss]
    t_fetch_kp = time.time() - t0
    t0 = time.time()
    for (chunk, _, rgb), kp in zip(batches, kps):
        sample_colors(rgb[..., ::-1][: len(chunk)], kp[: len(chunk)])
    t_colors = time.time() - t0
    t0 = time.time()
    descs = [np.asarray(f.descriptors) for f in fss]
    valids = [np.asarray(f.valid) for f in fss]
    t_bulk = time.time() - t0

    # Phase 3: pure compute+RTT — same batch N times, block at the end.
    g0 = jnp.asarray(batches[0][1])
    reps = 8
    t0 = time.time()
    outs = [extract_features(jnp.asarray(np.roll(batches[0][1], i, axis=1)), cfg)
            for i in range(reps)]
    for o in outs:
        o.keypoints_px.block_until_ready()
    t_pure = (time.time() - t0) / reps

    n = len(names)
    print(f"backend={jax.default_backend()} images={n} batch={B}")
    print(f"decode        {t_decode:6.2f} s  ({t_decode / n * 1e3:5.0f} ms/img)")
    print(f"upload+run    {t_dispatch:6.2f} s  (async dispatch)")
    print(f"fetch_kp      {t_fetch_kp:6.2f} s  ({t_fetch_kp / len(batches) * 1e3:5.0f} ms/batch)")
    print(f"colors        {t_colors:6.2f} s")
    print(f"bulk_fetch    {t_bulk:6.2f} s  (descriptors+valid)")
    print(f"pure extract  {t_pure:6.3f} s/batch ({t_pure / B * 1e3:5.0f} ms/img incl RTT)")


if __name__ == "__main__":
    main()
