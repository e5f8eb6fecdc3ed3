"""Typed artifact store — the structured replacement for the reference's
``output/*.npy`` filesystem protocol (SURVEY.md §1 artifact table).

Every pipeline stage can persist/restore its outputs, giving the same
stage-level checkpoint/resume capability the reference gets from np.save
(feature_extraction.py:41-50, matching.py:188-189, sfm.py:145-146) but with
one namespaced directory, np.savez compression, and metadata."""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


class ArtifactStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.npz")

    def save(self, name: str, **arrays: np.ndarray) -> None:
        # Compress only small artifacts: zlib on a multi-hundred-MB float32
        # voxel grid costs minutes of CPU for ~no ratio.
        total = sum(getattr(a, "nbytes", 0) for a in arrays.values())
        if total > 64 * 1024 * 1024:
            np.savez(self._path(name), **arrays)
        else:
            np.savez_compressed(self._path(name), **arrays)

    def load(self, name: str) -> Optional[Dict[str, np.ndarray]]:
        p = self._path(name)
        if not os.path.exists(p):
            return None
        with np.load(p, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def has(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def save_json(self, name: str, obj: Any) -> None:
        with open(os.path.join(self.root, f"{name}.json"), "w") as f:
            json.dump(obj, f, indent=2)

    def load_json(self, name: str) -> Any:
        p = os.path.join(self.root, f"{name}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


def clear_stale_feature_shards(root: str) -> None:
    """Delete features_shard*/.tmp leftovers from a crashed prior run.
    merge_feature_shards treats file EXISTENCE as shard completion, so a
    stale shard would be merged in place of the one the current worker is
    still writing. Call from process 0 before the start-of-run barrier."""
    if not os.path.isdir(root):
        return
    for f in os.listdir(root):
        if f.startswith("features_shard"):
            try:
                os.remove(os.path.join(root, f))
            except OSError:
                pass


def save_feature_shard(root: str, pid: int, feats) -> None:
    """One process's extraction shard (multi-host DP extraction). A
    temp-file rename makes the shard's appearance atomic for the merger's
    poll loop."""
    store = ArtifactStore(root)
    tmp = store._path(f"features_shard{pid}.tmp")
    np.savez(tmp,
             keypoints=feats.keypoints, keypoints_px=feats.keypoints_px,
             descriptors=feats.descriptors, valid=feats.valid,
             colors_bgr=feats.colors_bgr, image_size=feats.image_size)
    os.replace(tmp, store._path(f"features_shard{pid}"))


def merge_feature_shards(root: str, nproc: int, names, downscale: int,
                         t0: float, timeout_s: float = 1800.0) -> None:
    """Process 0 waits for every shard file and concatenates them into the
    canonical features artifact (deleting the shards). The shared
    filesystem is the cross-host interchange — the multi-host analog of
    the reference's output/ directory protocol (SURVEY §1)."""
    import time as _time

    store = ArtifactStore(root)
    deadline = _time.time() + timeout_s
    paths = [store._path(f"features_shard{p}") for p in range(nproc)]
    while not all(os.path.exists(p) for p in paths):
        if _time.time() > deadline:
            missing = [p for p in paths if not os.path.exists(p)]
            raise TimeoutError(f"extraction shards never appeared: {missing}")
        _time.sleep(0.2)
    parts = []
    for p in paths:
        with np.load(p, allow_pickle=False) as z:
            parts.append({k: z[k] for k in z.files})
    merged = {k: np.concatenate([s[k] for s in parts]) for k in parts[0]}
    store.save("features", **merged)
    store.save_json("features_meta", {"names": list(names),
                                      "downscale": downscale,
                                      "n_processes": nproc,
                                      "seconds": _time.time() - t0})
    for p in paths:
        os.remove(p)
