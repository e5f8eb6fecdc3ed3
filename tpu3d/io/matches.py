"""Persistence of the matching stage's COMPLETE state.

The reference persists only `img_pairs.npy` + `all_matches.npy`
(matching.py:188-189) and sfm.py re-derives coordinates from the feature
artifacts. Here one artifact pair (pairs_meta.json + matches.npz) carries
everything reconstruction needs — match indices AND coordinates, colors,
per-edge relative poses from the E-gate, the union-find track store, and
the retrieval view graph — so any reconstruction mode (incremental or
global pose-graph) can be re-run offline without re-matching on device.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpu3d.io.artifacts import ArtifactStore


def save_matches(artifact_dir: str, regs, ts, adj: Dict[int, List[int]],
                 seconds: float = 0.0) -> None:
    store = ArtifactStore(artifact_dir)
    store.save_json("pairs_meta", {
        "registrations": [
            {"img": r.img, "refs": [e.ref_img for e in r.edges],
             "edge_sizes": [len(e.idx_new) for e in r.edges]}
            for r in regs
        ],
        "adjacency": {str(k): list(map(int, v)) for k, v in adj.items()},
        "next_track": int(ts.next_track),
        "seconds": seconds,
    })
    arrays = {"kp_track": ts.kp_track, "parent": ts.parent[: max(ts.next_track, 1)]}
    for ri, r in enumerate(regs):
        for ei, e in enumerate(r.edges):
            pre = f"r{ri}_e{ei}"
            arrays[f"{pre}_idx_ref"] = e.idx_ref
            arrays[f"{pre}_idx_new"] = e.idx_new
            arrays[f"{pre}_track"] = e.track
            arrays[f"{pre}_uv_ref"] = e.uv_ref
            arrays[f"{pre}_uv_new"] = e.uv_new
            arrays[f"{pre}_colors"] = e.colors_ref
            if e.rel_R is not None:
                arrays[f"{pre}_relRt"] = np.concatenate(
                    [np.asarray(e.rel_R).ravel(), np.asarray(e.rel_t).ravel()]
                ).astype(np.float32)
    np.savez_compressed(os.path.join(artifact_dir, "matches.npz"), **arrays)


def load_matches(artifact_dir: str, n_images: int, kpts_per_image: int,
                 max_tracks: int) -> Optional[Tuple[list, object, Dict[int, List[int]]]]:
    """Returns (registrations, track_store, adjacency) or None."""
    from tpu3d.matching import TrackStore
    from tpu3d.sfm.engine import EdgeObservations, ImageRegistration

    store = ArtifactStore(artifact_dir)
    meta = store.load_json("pairs_meta")
    path = os.path.join(artifact_dir, "matches.npz")
    if meta is None or "adjacency" not in meta or not os.path.exists(path):
        return None
    data = np.load(path)
    ts = TrackStore(n_images, kpts_per_image, capacity=max_tracks)
    ts.kp_track = data["kp_track"]
    parent = data["parent"]
    ts.parent[: len(parent)] = parent
    ts.next_track = int(meta["next_track"])
    regs = []
    for ri, r in enumerate(meta["registrations"]):
        edges = []
        for ei, ref in enumerate(r["refs"]):
            pre = f"r{ri}_e{ei}"
            rel = data[f"{pre}_relRt"] if f"{pre}_relRt" in data else None
            edges.append(EdgeObservations(
                ref_img=int(ref),
                idx_ref=data[f"{pre}_idx_ref"], idx_new=data[f"{pre}_idx_new"],
                track=data[f"{pre}_track"],
                uv_ref=data[f"{pre}_uv_ref"], uv_new=data[f"{pre}_uv_new"],
                colors_ref=data[f"{pre}_colors"],
                rel_R=rel[:9].reshape(3, 3) if rel is not None else None,
                rel_t=rel[9:] if rel is not None else None,
            ))
        regs.append(ImageRegistration(img=int(r["img"]), edges=edges))
    adj = {int(k): v for k, v in meta["adjacency"].items()}
    return regs, ts, adj
