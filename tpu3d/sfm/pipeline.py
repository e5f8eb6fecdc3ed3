"""End-to-end reconstruction pipeline: the single-command counterpart of the
reference's four-script chain (feature_extraction.py → bow.py → matching.py
→ sfm.py), with in-memory typed interfaces and optional artifact-store
checkpoints between stages.

Stages:
  1. extract    — batched classical frontend (features/), device-batched
  2. retrieve   — BoW codebook + tf-idf + top-k view graph (matching/bow)
  3. match      — BFS over the view graph, mutual-NN matching + E-gating +
                  track union (mirrors matching.py:84-189 acceptance rules)
  4. reconstruct— incremental SfM engine (sfm/engine)
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.config import PipelineConfig
from tpu3d.features import extract_features
from tpu3d.features.frontend import sample_colors
from tpu3d.geometry.estimators import find_essential_ransac
from tpu3d.io.images import list_images, load_images
from tpu3d.matching import (
    TrackStore,
    bfs_pair_order,
    build_codebook,
    build_view_graph,
    match_descriptors,
    tfidf_vectors,
    topk_similar,
    vector_quantize,
)
from tpu3d.matching.pairs import connected_order_fallback
from tpu3d.sfm.engine import IncrementalSfM, PairObservations
from tpu3d.sfm.scene import Reconstruction


@dataclasses.dataclass
class ExtractedFeatures:
    """Host-side mirror of the reference's stage-1 artifacts
    (all_points / all_descriptors / all_colors / img_size, SURVEY §1)."""

    names: List[str]
    keypoints: np.ndarray     # (N, K, 2) centered
    keypoints_px: np.ndarray  # (N, K, 2)
    descriptors: np.ndarray   # (N, K, 128)
    valid: np.ndarray         # (N, K)
    colors_bgr: np.ndarray    # (N, K, 3)
    image_size: np.ndarray    # (N, 2) (W, H)


def run_extraction(
    img_dir: str,
    cfg: PipelineConfig,
    names: Optional[List[str]] = None,
    downscale: int = 1,
    verbose: bool = True,
) -> ExtractedFeatures:
    names = names if names is not None else list_images(img_dir)
    B = cfg.frontend.batch_size
    kps, kps_px, descs, valids, colors, sizes = [], [], [], [], [], []
    for s in range(0, len(names), B):
        chunk = names[s : s + B]
        gray, rgb = load_images(img_dir, chunk, downscale)
        # Pad the trailing batch so the jitted extractor sees one shape.
        pad = B - len(chunk)
        if pad:
            gray = np.concatenate([gray, np.repeat(gray[-1:], pad, 0)])
            rgb = np.concatenate([rgb, np.repeat(rgb[-1:], pad, 0)])
        fs = extract_features(jnp.asarray(gray), cfg.frontend)
        cols = sample_colors(rgb[..., ::-1], np.asarray(fs.keypoints_px))  # BGR like cv2
        n = len(chunk)
        kps.append(np.asarray(fs.keypoints)[:n])
        kps_px.append(np.asarray(fs.keypoints_px)[:n])
        descs.append(np.asarray(fs.descriptors)[:n])
        valids.append(np.asarray(fs.valid)[:n])
        colors.append(np.asarray(cols)[:n])
        sizes.append(np.asarray(fs.image_size)[:n])
        if verbose:
            print(f"[extract] {s + n}/{len(names)} images", flush=True)
    return ExtractedFeatures(
        names=list(names),
        keypoints=np.concatenate(kps),
        keypoints_px=np.concatenate(kps_px),
        descriptors=np.concatenate(descs),
        valid=np.concatenate(valids),
        colors_bgr=np.concatenate(colors),
        image_size=np.concatenate(sizes),
    )


def run_retrieval(feats: ExtractedFeatures, cfg: PipelineConfig, seed: int = 0):
    """BoW codebook + tf-idf retrieval + view graph (ref bow.py +
    matching.py:22-82). Returns the adjacency dict."""
    key = jax.random.PRNGKey(seed)
    d = jnp.asarray(feats.descriptors)
    v = jnp.asarray(feats.valid.astype(np.float32))
    codebook = build_codebook(key, d, v, cfg.retrieval.codebook_size, cfg.retrieval.kmeans_iters)
    words = jax.vmap(lambda x: vector_quantize(x, codebook))(d)
    tv = tfidf_vectors(words, v, cfg.retrieval.codebook_size)
    idx, sim = topk_similar(tv, cfg.retrieval.top_k)
    return build_view_graph(
        np.asarray(idx), np.asarray(sim),
        cfg.retrieval.similarity_threshold, cfg.retrieval.min_neighbors,
    )


def _match_one_pair(feats, i, j, cfg, key):
    """Mutual-NN match + E-gate for one candidate pair. Returns
    (sel_mask, idx0, idx1, uv0, uv1, n_raw, n_front) — sel is None if the
    pair fails the raw-match or inlier gates."""
    d = feats.descriptors
    v = feats.valid.astype(np.float32)
    res = match_descriptors(
        jnp.asarray(d[i]), jnp.asarray(d[j]),
        jnp.asarray(v[i]), jnp.asarray(v[j]),
        ratio=cfg.matching.ratio_threshold,
    )
    mvalid = np.asarray(res.valid)
    n_raw = int(mvalid.sum())
    idx0 = np.asarray(res.idx0)
    idx1 = np.asarray(res.idx1)
    uv0 = feats.keypoints[i][idx0]
    uv1 = feats.keypoints[j][idx1]
    if n_raw < cfg.matching.min_raw_matches:
        return None, idx0, idx1, uv0, uv1, n_raw, 0
    eres = find_essential_ransac(
        key, jnp.asarray(uv0), jnp.asarray(uv1), jnp.asarray(mvalid.astype(np.float32)),
        cfg.camera.focal_length, threshold_px=cfg.matching.ransac_threshold_px,
        num_hypotheses=cfg.sfm.ransac.num_hypotheses,
    )
    n_front = int(jnp.sum(eres.front))
    if n_front <= cfg.matching.min_inliers:
        return None, idx0, idx1, uv0, uv1, n_raw, n_front
    sel = mvalid & np.asarray(eres.inliers)
    return sel, idx0, idx1, uv0, uv1, n_raw, n_front


def run_matching(
    feats: ExtractedFeatures,
    adj: Dict[int, List[int]],
    cfg: PipelineConfig,
    seed: int = 1,
    verbose: bool = True,
) -> Tuple[List[PairObservations], TrackStore]:
    """BFS matching with interleaved acceptance (mirrors matching.py:84-189).

    The BFS frontier only grows when a pair passes all gates — exactly the
    reference's queue semantics (matching.py:175): an image whose first
    candidate pair fails can still be reached later through another visited
    neighbor. For each new image, the reference image is the first visited
    neighbor in its adjacency list (matching.py:98-105)."""
    n_img, K, _ = feats.descriptors.shape
    ts = TrackStore(n_img, K, capacity=cfg.sfm.max_tracks)
    key = jax.random.PRNGKey(seed)
    accepted: List[PairObservations] = []
    if not adj or all(len(v) == 0 for v in adj.values()):
        adj = {i: ([i - 1] if i else []) + ([i + 1] if i + 1 < n_img else []) for i in range(n_img)}
    start = max(adj, key=lambda i: len(adj[i]))
    visited = {start}
    queue = [start]
    first = True
    qi = 0
    while qi < len(queue):
        u = queue[qi]
        qi += 1
        for vtx in adj[u]:
            if vtx in visited:
                continue
            ref = u
            for w in adj[vtx]:
                if w == u:
                    break
                if w in visited:
                    ref = w
                    break
            i, j = ref, vtx
            key, sub = jax.random.split(key)
            sel, idx0, idx1, uv0, uv1, n_raw, n_front = _match_one_pair(feats, i, j, cfg, sub)
            if sel is None:
                if verbose:
                    print(f"[match] ({i},{j}) rejected: raw={n_raw} front={n_front}", flush=True)
                continue
            if not first:
                overlap = ts.overlap_fraction(i, j, idx0[sel], idx1[sel])
                if overlap < cfg.matching.min_track_overlap:
                    if verbose:
                        print(f"[match] ({i},{j}) rejected: overlap {overlap:.2f}", flush=True)
                    continue
            track_sel = ts.union_pair(i, j, idx0[sel], idx1[sel])
            track = np.full(K, -1, np.int64)
            track[sel] = track_sel
            accepted.append(
                PairObservations(
                    img0=i, img1=j,
                    idx0=idx0, idx1=idx1, track=track,
                    uv0=uv0.astype(np.float32), uv1=uv1.astype(np.float32),
                    valid=sel,
                    colors0=feats.colors_bgr[i][idx0],
                )
            )
            first = False
            visited.add(vtx)
            queue.append(vtx)
            if verbose:
                print(f"[match] ({i},{j}) accepted: {int(sel.sum())} inlier matches", flush=True)
    return accepted, ts


def run_reconstruction(
    feats: ExtractedFeatures,
    pairs: List[PairObservations],
    ts: TrackStore,
    cfg: PipelineConfig,
    verbose: bool = True,
) -> Reconstruction:
    engine = IncrementalSfM(n_images=len(feats.names), config=cfg.sfm)
    for p in pairs:
        # Canonicalize track ids (unions may have merged since creation).
        p.track[p.valid] = ts.resolve(p.track[p.valid])
        info = engine.register_pair(p)
        if verbose:
            print(f"[sfm] {info}", flush=True)
    return engine.finalize(feats.names)


def reconstruct(
    img_dir: str,
    cfg: Optional[PipelineConfig] = None,
    names: Optional[List[str]] = None,
    downscale: int = 1,
    verbose: bool = True,
) -> Tuple[Reconstruction, Dict[str, float]]:
    """Full pipeline. Returns (reconstruction, stage timings in seconds)."""
    cfg = cfg or PipelineConfig()
    timings: Dict[str, float] = {}
    t0 = time.time()
    feats = run_extraction(img_dir, cfg, names, downscale, verbose)
    timings["extract"] = time.time() - t0
    t0 = time.time()
    adj = run_retrieval(feats, cfg)
    timings["retrieve"] = time.time() - t0
    t0 = time.time()
    pairs, ts = run_matching(feats, adj, cfg, verbose=verbose)
    timings["match"] = time.time() - t0
    t0 = time.time()
    rec = run_reconstruction(feats, pairs, ts, cfg, verbose=verbose)
    timings["reconstruct"] = time.time() - t0
    timings["total"] = sum(timings.values())
    return rec, timings
