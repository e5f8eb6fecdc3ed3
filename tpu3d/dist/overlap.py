"""Cross-host STAGE overlap: front-end extraction and back-end matching
run concurrently across the process group.

The plain multi-host path (cli extract --distributed) is within-stage DP:
every process extracts a shard, process 0 merges, and only THEN does any
back-end work start — the pipeline's stages never overlap across the pod
(SURVEY §2.2 parallelism table, pipeline row; the reference has no
distribution at all). Here each worker publishes every extraction BATCH to
the shared artifact store as it completes, and process 0 — while
extracting its own shard — consumes published batches from all hosts and
prematches sequential-prior candidate edges the moment both endpoints are
resident (sfm.pipeline.SequentialPrematcher). By the time the last shard
lands, most of the match stage's device work is already done; process 0
then merges features, runs retrieval, and the remaining matching skips
every prematched edge.

The shared filesystem is the cross-host interchange (the multi-host analog
of the reference's output/ protocol, SURVEY §1); batch files appear
atomically via temp-file rename.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


def _shard_ranges(n_images: int, nproc: int) -> List[Tuple[int, int]]:
    """Balanced contiguous shards (sizes differ by at most 1). The naive
    ceil split can yield an EMPTY trailing shard (N=9, nproc=4 ->
    (9,9)) whose worker would crash run_extraction on an empty name
    list and tear down the whole process group."""
    base, rem = divmod(n_images, nproc)
    ranges, start = [], 0
    for p in range(nproc):
        n = base + (1 if p < rem else 0)
        ranges.append((start, start + n))
        start += n
    return ranges


def _batch_path(root: str, start: int) -> str:
    return os.path.join(root, f"fbatch_{start:06d}.npz")


def publish_feature_batch(root: str, start: int, fs, n: int) -> None:
    """Atomically publish one extraction batch's match-relevant features
    (descriptors/valid/keypoints) keyed by its global image start index."""
    os.makedirs(root, exist_ok=True)
    # np.savez appends .npz when absent — keep the suffix on the temp name
    # so os.replace targets the file actually written.
    tmp = _batch_path(root, start) + ".tmp.npz"
    np.savez(tmp,
             descriptors=np.asarray(fs.descriptors[:n]),
             valid=np.asarray(fs.valid[:n]),
             keypoints=np.asarray(fs.keypoints[:n]))
    os.replace(tmp, _batch_path(root, start))


def _poll_batches(root: str, expected_starts, seen: set):
    """Newly published (start, arrays) batches, in arrival order."""
    out = []
    for s in expected_starts:
        if s in seen:
            continue
        p = _batch_path(root, s)
        if os.path.exists(p):
            with np.load(p, allow_pickle=False) as z:
                out.append((s, {k: z[k] for k in z.files}))
            seen.add(s)
    return out


def run_overlapped_extraction(
    img_dir: str,
    cfg,
    names: List[str],
    downscale: int = 1,
    verbose: bool = True,
    prematch_memo: Optional[Dict] = None,
    timeout_s: float = 1800.0,
):
    """Multi-process extraction with process-0 back-end overlap.

    Workers (process_index > 0): extract their shard, publishing each
    batch, then save their full feature shard and return None.
    Process 0: extract shard 0 (publishing batches into its OWN prematcher
    directly), poll+consume other hosts' batches between its own, merge
    everything at the end, and return the full ExtractedFeatures with
    `prematch_memo` filled.
    """
    import jax

    from tpu3d.io.artifacts import (clear_stale_feature_shards,
                                    merge_feature_shards, save_feature_shard)
    from tpu3d.sfm.pipeline import (ExtractedFeatures, SequentialPrematcher,
                                    run_extraction)

    pid, nproc = jax.process_index(), jax.process_count()
    if nproc > len(names):
        raise ValueError(f"stage-overlap: {nproc} processes for "
                         f"{len(names)} images — every process needs a "
                         "non-empty shard")
    N = len(names)
    ranges = _shard_ranges(N, nproc)
    lo, hi = ranges[pid]
    shard_names = names[lo:hi]
    t0 = time.time()
    batch_root = os.path.join(cfg.artifact_dir or "artifacts", "fbatches")

    done_marker = os.path.join(batch_root, "overlap_done")
    # Clear stale state from previous/crashed runs BEFORE anyone extracts:
    # a surviving done marker makes workers skip the completion wait (the
    # fatal shutdown-barrier race all over again) and leftover fbatch_*
    # files would be consumed as if they held this run's features. The
    # group barrier keeps worker publishes from racing the cleanup.
    from jax.experimental import multihost_utils

    if pid == 0:
        if os.path.isdir(batch_root):
            for f in os.listdir(batch_root):
                if f.startswith("fbatch_") or f == "overlap_done":
                    try:
                        os.remove(os.path.join(batch_root, f))
                    except OSError:
                        pass
        # Leftover features_shard* from a crashed prior run are just as
        # dangerous: merge_feature_shards treats file existence as shard
        # completion, so a stale shard could be merged while this run's
        # worker is still extracting (ADVICE r3).
        clear_stale_feature_shards(cfg.artifact_dir or "artifacts")
    multihost_utils.sync_global_devices("tpu3d_overlap_start")
    if pid != 0:
        # Worker: front-end only. Publish every batch as it completes,
        # then WAIT for process 0's completion marker — exiting early
        # would trip the jax.distributed shutdown barrier while process 0
        # is still matching (observed as a fatal coordination-service
        # error killing the whole group).
        def on_batch(fs, start, n):
            publish_feature_batch(batch_root, start, fs, n)

        feats = run_extraction(img_dir, cfg, shard_names, downscale,
                               verbose=verbose, batch_callback=on_batch,
                               batch_offset=lo)
        save_feature_shard(cfg.artifact_dir, pid, feats)
        deadline = time.time() + timeout_s
        while not os.path.exists(done_marker):
            if time.time() > deadline:
                raise TimeoutError("stage-overlap: process 0 never finished")
            time.sleep(0.2)
        return None

    # Process 0: extract own shard with the prematcher fed BOTH locally and
    # from other hosts' published batches.
    memo = prematch_memo if prematch_memo is not None else {}
    pm = (SequentialPrematcher(N, cfg) if cfg.matching.pair_batch > 1
          and cfg.matching.matcher == "mnn" and N > 1 else None)
    expected = []
    for p in range(1, nproc):
        plo, phi = ranges[p]
        expected.extend(range(plo, phi, cfg.frontend.batch_size))
    seen: set = set()

    def consume_remote():
        # Poll even when the prematcher is off — `seen` drives the
        # completion wait below, which would otherwise spin to its
        # timeout with every batch file already on disk.
        for s, arrs in _poll_batches(batch_root, expected, seen):
            if pm is not None:
                pm.add_features(s, arrs["descriptors"], arrs["valid"],
                                arrs["keypoints"], len(arrs["descriptors"]))

    def on_batch(fs, start, n):
        if pm is not None:
            pm.add_features(start, fs.descriptors, fs.valid, fs.keypoints, n)
        consume_remote()

    feats0 = run_extraction(img_dir, cfg, shard_names, downscale,
                            verbose=verbose, batch_callback=on_batch,
                            batch_offset=0)
    # Keep consuming until every remote batch has arrived.
    deadline = time.time() + timeout_s
    while len(seen) < len(expected):
        consume_remote()
        if len(seen) >= len(expected):
            break
        if time.time() > deadline:
            raise TimeoutError(
                f"stage-overlap: only {len(seen)}/{len(expected)} remote "
                "batches arrived")
        time.sleep(0.1)
    consume_remote()
    if pm is not None:
        pm.finish(memo)
    # Merge the canonical features artifact (workers saved full shards).
    save_feature_shard(cfg.artifact_dir, 0, feats0)
    merge_feature_shards(cfg.artifact_dir, nproc, names, downscale, t0)
    for s in list(seen):
        try:
            os.remove(_batch_path(batch_root, s))
        except OSError:
            pass
    with open(done_marker, "w") as f:
        f.write("ok")
    # Reload merged features as the canonical ExtractedFeatures.
    import jax.numpy as jnp

    from tpu3d.io.artifacts import ArtifactStore

    data = ArtifactStore(cfg.artifact_dir).load("features")
    return ExtractedFeatures(
        names=list(names),
        keypoints=data["keypoints"],
        keypoints_px=data["keypoints_px"],
        valid=data["valid"],
        colors_bgr=data["colors_bgr"],
        image_size=data["image_size"],
        descriptors_dev=jnp.asarray(data["descriptors"]),
        valid_dev=jnp.asarray(data["valid"].astype(np.float32)),
        keypoints_dev=jnp.asarray(data["keypoints"]),
    )
