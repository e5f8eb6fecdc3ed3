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
import functools
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.config import PipelineConfig
from tpu3d.features import extract_features
from tpu3d.features.frontend import sample_colors
from tpu3d.geometry.estimators import find_essential_ransac
from tpu3d.utils.dispatch import tick as _tick
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
from tpu3d.sfm.engine import (
    MAX_REFS,
    EdgeObservations,
    ImageRegistration,
    IncrementalSfM,
    PairObservations,
)
from tpu3d.sfm.scene import Reconstruction


@dataclasses.dataclass
class ExtractedFeatures:
    """Stage-1 output (the reference's all_points / all_descriptors /
    all_colors / img_size artifact set, SURVEY §1).

    Descriptors and validity masks stay DEVICE-resident (`_dev` fields):
    retrieval and matching consume them directly, so the multi-megabyte
    descriptor tensors never cross the host link again (on a remote-TPU
    backend every re-upload is seconds of wall clock). Small per-keypoint
    geometry/color arrays live on the host for the numpy bookkeeping."""

    names: List[str]
    keypoints: np.ndarray     # (N, K, 2) centered
    keypoints_px: np.ndarray  # (N, K, 2)
    valid: np.ndarray         # (N, K) bool (host copy)
    colors_bgr: np.ndarray    # (N, K, 3)
    image_size: np.ndarray    # (N, 2) (W, H)
    descriptors_dev: object   # jnp (N, K, 128) on device
    valid_dev: object         # jnp (N, K) float32 on device
    keypoints_dev: object = None  # jnp (N, K, 2) on device (matching gathers)

    @property
    def descriptors(self) -> np.ndarray:
        """Host copy (artifact persistence only — one bulk download)."""
        return np.asarray(self.descriptors_dev)


class SequentialPrematcher:
    """Incremental sequential-prior matching alongside extraction.

    Features stream in (from the local extract loop, or from other hosts'
    published batch shards in the stage-overlap path, dist/overlap.py);
    as soon as BOTH endpoints of a (g-off, g) candidate edge are resident,
    the edge joins the next vmapped match+gate block. Fixed-shape (N, K, D)
    update-slice buffers keep every block on the same executable as the
    post-retrieval matching path."""

    def __init__(self, n_images: int, cfg: PipelineConfig,
                 offsets: Tuple[int, ...] = (1, 2, 3)):
        self.N = n_images
        self.cfg = cfg
        self.offsets = offsets
        self.key = jax.random.PRNGKey(17)
        self.d = self.v = self.kp = None
        self.have = np.zeros(n_images, bool)
        self.edges: List[Tuple[int, int]] = []
        self.queued: set = set()
        self.pending: List[Tuple[List[Tuple[int, int]], object]] = []

    def _keys(self, blk):
        # Per-edge keys by edge id, independent of dispatch grouping.
        ids = jnp.asarray([e[0] * self.N + e[1] for e in blk], jnp.uint32)
        return jax.vmap(lambda e: jax.random.fold_in(self.key, e))(ids)

    def _dispatch(self, final=False):
        cfg = self.cfg
        Bm = max(int(cfg.matching.pair_batch), 1)
        while len(self.edges) >= Bm or (final and self.edges):
            blk = self.edges[:Bm]
            self.edges = self.edges[Bm:]
            pad = Bm - len(blk)
            ii = np.array([e[0] for e in blk] + [blk[-1][0]] * pad, np.int32)
            jj = np.array([e[1] for e in blk] + [blk[-1][1]] * pad, np.int32)
            kb = self._keys(blk + [blk[-1]] * pad)
            self.pending.append((blk, _match_and_gate_block(
                self.d, self.v, self.kp,
                jnp.asarray(ii), jnp.asarray(jj), kb,
                cfg.camera.focal_length, cfg.matching.ransac_threshold_px,
                cfg.matching.ratio_threshold, cfg.sfm.ransac.num_hypotheses,
                five_point=cfg.sfm.ransac.use_five_point,
            )))

    def add_features(self, start, descriptors, valid, keypoints, n):
        """Register n images' features beginning at global index `start`
        (device or host arrays, leading dim >= n) and dispatch any match
        blocks that became ready."""
        n = min(n, self.N - start)
        if self.d is None:
            K, D = descriptors.shape[1:]
            self.d = jnp.zeros((self.N, K, D), jnp.float32)
            self.v = jnp.zeros((self.N, K), jnp.float32)
            self.kp = jnp.zeros((self.N, K, 2), jnp.float32)
        upd = jax.lax.dynamic_update_slice
        self.d = upd(self.d, jnp.asarray(descriptors[:n], jnp.float32), (start, 0, 0))
        self.v = upd(self.v, jnp.asarray(valid[:n]).astype(jnp.float32), (start, 0))
        self.kp = upd(self.kp, jnp.asarray(keypoints[:n], jnp.float32), (start, 0, 0))
        self.have[start : start + n] = True
        for g in range(start, start + n):
            for off in self.offsets:
                for a, b in ((g - off, g), (g, g + off)):
                    if (0 <= a and b < self.N and self.have[a]
                            and self.have[b] and (a, b) not in self.queued):
                        self.queued.add((a, b))
                        self.edges.append((a, b))
        self._dispatch()

    def finish(self, memo: Dict) -> Dict:
        """Dispatch the tail block and fetch every pending result into
        `memo` {(i, j): packed flat row}."""
        self._dispatch(final=True)
        for blk, flat_dev in self.pending:
            flat = np.asarray(flat_dev)
            _tick("match_block")
            for b, e in enumerate(blk):
                memo[e] = flat[b]
        self.pending = []
        return memo


def run_extraction(
    img_dir: str,
    cfg: PipelineConfig,
    names: Optional[List[str]] = None,
    downscale: int = 1,
    verbose: bool = True,
    prematch_memo: Optional[Dict] = None,
    prematch_offsets: Tuple[int, ...] = (1, 2, 3),
    batch_callback=None,
    batch_offset: int = 0,
) -> ExtractedFeatures:
    """batch_callback(fs, global_start, n): invoked as each batch's
    features become device-resident (still async) — the stage-overlap
    path's hook for publishing/consuming cross-host batches
    (dist/overlap.py). batch_offset shifts this run's image indices into
    the global numbering when extracting a shard.

    prematch_memo: when given (reconstruct's e2e path), sequential-prior
    candidate edges (g-off, g) are matched + E-gated DURING the extraction
    loop, filling the memo _batch_match_pairs consumes — the match blocks
    ride in the device gaps the per-batch keypoint download leaves, so on a
    sequential capture most of the match stage's device time is hidden
    behind extraction. Fixed-shape (N, K, D) buffers keep every block on
    the same executable as the post-retrieval blocks."""
    names = names if names is not None else list_images(img_dir)
    B = cfg.frontend.batch_size

    # Front-end dispatch: classical (weight-free, default) or a learned
    # model (DISK — the reference's production extractor,
    # feature_extraction.py:28 — or SuperPoint) with converted weights.
    fe_params = None
    if cfg.frontend.model != "classical":
        from tpu3d.features.learned import extract_learned, load_frontend_params

        if not cfg.frontend.weights:
            raise ValueError(
                f"frontend model {cfg.frontend.model!r} needs FrontendConfig."
                "weights (torch checkpoint or converted .npz)")
        fe_params = jax.tree_util.tree_map(
            jnp.asarray, load_frontend_params(cfg.frontend.model,
                                              cfg.frontend.weights))

    def load_batch(s):
        chunk = names[s : s + B]
        gray, rgb = load_images(img_dir, chunk, downscale)
        # Pad the trailing batch so the jitted extractor sees one shape.
        pad = B - len(chunk)
        if pad:
            gray = np.concatenate([gray, np.repeat(gray[-1:], pad, 0)])
            rgb = np.concatenate([rgb, np.repeat(rgb[-1:], pad, 0)])
        return chunk, (gray * 255.0 + 0.5).astype(np.uint8), rgb

    # JPEG decode overlaps device compute: a single-worker prefetch thread
    # keeps one decoded batch in flight ahead of the extractor.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=2)
    starts = list(range(0, len(names), B))
    # Host->device transfers are grouped: G batches ride ONE upload and the
    # extractor dispatches on device-side slices. The r5 full-run profile
    # showed 73 per-batch uploads costing ~355 ms each (25.9 s of a 33.4 s
    # dispatch loop) on the remote tunnel — per-transfer round trip, not
    # bandwidth (a 4-image u8 batch is 2.5 MB ~= 84 ms at link rate).
    # Grouping 8 batches per transfer cuts the round trips 8x; keypoints
    # are bit-identical (same u8 bytes, same per-batch executable).
    G = 8
    if len(starts) <= G:
        # Small runs (the 24-image bench is 6 batches): split into two
        # groups so group k+1's upload overlaps group k's device compute.
        G = max(2, (len(starts) + 1) // 2)
    groups = [starts[g : g + G] for g in range(0, len(starts), G)]
    futures = {s: pool.submit(load_batch, s) for grp in groups[:2] for s in grp}

    # Device-resident accumulators; the only per-batch host transfer is the
    # uint8 image upload. ALL downloads happen in bulk after the dispatch
    # loop (r5): the former depth-2 dispatch/drain pipeline still paid a
    # per-batch keypoint fetch that serialized against the next dispatch on
    # the remote tunnel (~0.3 s/batch wall vs 0.17 s device at full-run
    # scale, VERDICT r4 #6). Dispatching every batch back-to-back and
    # fetching keypoints ONCE removes 73 round-trip syncs from the full
    # run; color sampling moves after the loop (decoded RGB is kept on the
    # host — ~2.2 GB at 290 images ds2, fine on a 125 GB host). Keypoints
    # are bit-identical: the device graph is untouched, only the fetch
    # schedule changed.
    batches = []                       # (chunk, rgb, fs) in batch order
    n_disp = 0
    t_decode = t_upload = 0.0
    t_loop0 = time.time()

    # --- sequential-prior prematch state (see docstring) ---
    N = len(names)
    prematch = (prematch_memo is not None and cfg.matching.pair_batch > 1
                and cfg.matching.matcher == "mnn" and N > 1)
    pm = SequentialPrematcher(N, cfg, prematch_offsets) if prematch else None

    # Upload as uint8 (4x less host-link traffic), one transfer per group,
    # issued from a single-worker thread so group k+1's transfer rides
    # UNDER group k's device compute; the extractor normalizes on device.
    # The learned path keeps per-batch host arrays (extract_learned
    # samples colors host-side).
    up_pool = ThreadPoolExecutor(max_workers=1)

    def _upload_group(gi):
        t0 = time.time()
        loaded = [futures.pop(s).result() for s in groups[gi]]
        t_dec = time.time() - t0
        dev, t_up = None, 0.0
        if fe_params is None:
            t0 = time.time()
            dev = jnp.asarray(np.concatenate([g for _, g, _ in loaded]))
            t_up = time.time() - t0
        return loaded, dev, t_dec, t_up

    upload_futs = {0: up_pool.submit(_upload_group, 0)} if groups else {}
    for gi, grp in enumerate(groups):
        loaded, gray_dev, t_dec, t_up = upload_futs.pop(gi).result()
        t_decode += t_dec
        t_upload += t_up
        if gi + 2 < len(groups):
            for s in groups[gi + 2]:
                futures[s] = pool.submit(load_batch, s)
        if gi + 1 < len(groups):
            upload_futs[gi + 1] = up_pool.submit(_upload_group, gi + 1)
        for k, (chunk, gray_u8, rgb) in enumerate(loaded):
            s = grp[k]
            _t = time.time()
            if fe_params is None:
                fs = extract_features(gray_dev[k * B : (k + 1) * B],
                                      cfg.frontend)
            else:
                fs = extract_learned(fe_params, cfg.frontend.model, gray_u8,
                                     rgb, cfg.frontend)
            t_upload += time.time() - _t
            _tick("extract_batch")
            batches.append((chunk, rgb, fs))
            if pm is not None:
                pm.add_features(s, fs.descriptors, fs.valid, fs.keypoints,
                                len(chunk))
            if batch_callback is not None:
                batch_callback(fs, batch_offset + s, len(chunk))
            n_disp += len(chunk)
        if verbose and (gi % 2 == 0 or gi + 1 == len(groups)):
            print(f"[extract] dispatched {n_disp}/{len(names)} images",
                  flush=True)
    pool.shutdown(wait=False)
    up_pool.shutdown(wait=False)
    if pm is not None:
        pm.finish(prematch_memo)
    t_dispatch_loop = time.time() - t_loop0
    # One bulk fetch for everything host-side work needs.
    _t = time.time()
    kp_px_all = np.asarray(jnp.concatenate(
        [fs.keypoints_px[: len(c)] for c, _, fs in batches]))
    _tick("extract_bulk_fetch")
    t_fetch = time.time() - _t
    LAST_EXTRACT_TIMERS.clear()
    LAST_EXTRACT_TIMERS.update(
        decode_wait=round(t_decode, 2), upload_dispatch=round(t_upload, 2),
        dispatch_loop=round(t_dispatch_loop, 2),
        drain_and_kp_fetch=round(t_fetch, 2))
    colors = []
    ofs = 0
    for chunk, rgb, fs in batches:
        n = len(chunk)
        colors.append(sample_colors(rgb[..., ::-1][:n],
                                    kp_px_all[ofs: ofs + n]))  # BGR like cv2
        ofs += n
    valid_dev = jnp.concatenate([fs.valid[: len(c)] for c, _, fs in batches])
    keypoints_dev = jnp.concatenate(
        [fs.keypoints[: len(c)] for c, _, fs in batches])
    if verbose:
        print(f"[extract] {len(names)}/{len(names)} images", flush=True)
    return ExtractedFeatures(
        names=list(names),
        keypoints=np.asarray(keypoints_dev),
        keypoints_px=kp_px_all,
        valid=np.asarray(valid_dev),
        colors_bgr=np.concatenate(colors),
        image_size=np.asarray(jnp.concatenate(
            [fs.image_size[: len(c)] for c, _, fs in batches])),
        descriptors_dev=jnp.concatenate(
            [fs.descriptors[: len(c)] for c, _, fs in batches]),
        valid_dev=valid_dev.astype(jnp.float32),
        keypoints_dev=keypoints_dev,
    )


@functools.partial(jax.jit, static_argnames=("k", "iters", "top_k"))
def _retrieval_fused(key, d, v, k, iters, top_k):
    """Codebook build + vq + tf-idf + top-k similarity in ONE dispatch
    (each stage alone costs a device round trip on a remote backend)."""
    codebook = build_codebook(key, d, v, k, iters)
    words = jax.vmap(vector_quantize, in_axes=(0, None))(d, codebook)
    tv = tfidf_vectors(words, v, k)
    return topk_similar(tv, top_k)


def run_retrieval(feats: ExtractedFeatures, cfg: PipelineConfig, seed: int = 0):
    """BoW codebook + tf-idf retrieval + view graph (ref bow.py +
    matching.py:22-82). Returns the adjacency dict."""
    key = jax.random.PRNGKey(seed)
    d = feats.descriptors_dev
    v = feats.valid_dev
    idx, sim = _retrieval_fused(key, d, v, cfg.retrieval.codebook_size,
                                cfg.retrieval.kmeans_iters, cfg.retrieval.top_k)
    _tick("retrieve")
    adj = build_view_graph(
        np.asarray(idx), np.asarray(sim),
        cfg.retrieval.similarity_threshold, cfg.retrieval.min_neighbors,
    )
    # Temporal prior for ordered captures; bogus edges die at the E-gate.
    n = len(feats.names)
    for k in range(1, cfg.retrieval.sequential_prior + 1):
        for i in range(n - k):
            j = i + k
            if j not in adj[i]:
                adj[i].append(j)
            if i not in adj[j]:
                adj[j].append(i)
    return adj


def _lightglue_module(lg_params, input_dim):
    """Static LightGlue hyperparams from the (static) param-tree structure."""
    from tpu3d.matching.lightglue import LightGlue

    p = lg_params["params"]
    n_layers = 1 + max(int(k.rsplit("_", 1)[1]) for k in p if k.startswith("self_attn_"))
    dim = p[f"log_assignment_{n_layers - 1}"]["final_proj"]["kernel"].shape[1]
    return LightGlue(input_dim=input_dim, dim=dim, n_layers=n_layers)


def _match_and_gate_body(d0, d1, v0, v1, kp0, kp1, key, focal, thr_px, ratio, num_hypotheses,
                         five_point=False, lg=None):
    """Fused match + E-RANSAC gate, packed into ONE flat array so the host
    pays a single device->host round trip per candidate pair. The matcher is
    mutual-NN (default) or LightGlue when `lg = (params, size0, size1)` is
    given (the reference's matcher, matching.py:122)."""
    if lg is None:
        res = match_descriptors(d0, d1, v0, v1, ratio=ratio)
    else:
        from tpu3d.core.camera import centered_to_pixel
        from tpu3d.matching.lightglue import filter_matches
        from tpu3d.matching.mnn import MatchResult

        lg_params, size0, size1 = lg
        mod = _lightglue_module(lg_params, d0.shape[-1])
        # LightGlue normalizes PIXEL keypoints against the image size the
        # way its checkpoints were trained; our stored coords are centered
        # y-up (ref convention) — map back (ref matching.py:109,116 does
        # the same un-centering before calling LightGlue).
        kp0_px = centered_to_pixel(kp0, size0[None, :])
        kp1_px = centered_to_pixel(kp1, size1[None, :])
        with jax.default_matmul_precision("float32"):
            scores = mod.apply(lg_params, kp0_px[None], d0[None], size0[None],
                               kp1_px[None], d1[None], size1[None],
                               v0[None], v1[None])
        m0, _, ms0, _ = filter_matches(scores, threshold=0.1)
        ok = (m0[0] >= 0) & (v0 > 0)
        res = MatchResult(
            idx0=jnp.arange(d0.shape[0], dtype=jnp.int32),
            idx1=jnp.maximum(m0[0], 0).astype(jnp.int32),
            valid=ok,
            score=ms0[0],
        )
    uv0 = kp0  # slot k of the match result is keypoint k of image 0
    uv1 = kp1[res.idx1]
    mvalid = res.valid.astype(jnp.float32)
    if five_point:
        # Nistér minimal solver (planar-safe) for the consensus set, then
        # the shared refit + cheirality machinery via a warm-started
        # 8-point path on the 5-point inliers.
        from tpu3d.geometry.fivepoint import five_point_ransac

        k5, k8 = jax.random.split(key)
        _, inl5, _ = five_point_ransac(
            k5, uv0, uv1, mvalid, focal,
            threshold_px=thr_px, num_hypotheses=max(num_hypotheses // 4, 64),
        )
        gate_valid = jnp.where(jnp.sum(inl5) >= 8, inl5.astype(jnp.float32), mvalid)
        eres = find_essential_ransac(
            k8, uv0, uv1, gate_valid, focal,
            threshold_px=thr_px, num_hypotheses=num_hypotheses,
        )
    else:
        eres = find_essential_ransac(
            key, uv0, uv1, mvalid, focal,
            threshold_px=thr_px, num_hypotheses=num_hypotheses,
        )
    sel = (res.valid & eres.inliers).astype(jnp.float32)
    K = d0.shape[0]
    per_kpt = jnp.stack([res.idx1.astype(jnp.float32), mvalid, sel], axis=-1)  # (K, 3)
    stats = jnp.stack([jnp.sum(mvalid), jnp.sum(eres.front).astype(jnp.float32)])
    return jnp.concatenate([per_kpt.reshape(-1), stats, eres.R.reshape(-1), eres.t])


_match_and_gate_packed = jax.jit(
    _match_and_gate_body,
    static_argnames=("ratio", "num_hypotheses", "five_point"),
)


@functools.partial(jax.jit, static_argnames=("ratio", "num_hypotheses", "five_point"))
def _match_and_gate_block(d, v, kp, ii, jj, keys, focal, thr_px, ratio,
                          num_hypotheses, five_point=False, sizes=None,
                          lg_params=None):
    """One dispatch gates a whole block of candidate edges: gather the
    per-edge descriptor/keypoint slices from the device-resident tensors
    and vmap the fused match+gate body. On the remote-TPU tunnel the
    sequential per-edge path costs a full round trip per edge (matching is
    the dominant pipeline stage); blocking amortizes both the dispatch and
    the 5-point solver's small-matrix work."""
    def one(i, j, key):
        lg = None if lg_params is None else (lg_params, sizes[i], sizes[j])
        return _match_and_gate_body(d[i], d[j], v[i], v[j], kp[i], kp[j], key,
                                    focal, thr_px, ratio, num_hypotheses,
                                    five_point, lg=lg)

    return jax.vmap(one)(ii, jj, keys)


_LG_PARAMS_CACHE: Dict[str, object] = {}
_GATE_BLOCK_STICKY: Optional[int] = None


def prewarm_gate_async(cfg, n_images: int):
    """Fire-and-forget compile of the fused match+gate block executable on
    a background thread, so its ~40 s server-side compile (the r5 kernels
    trade bigger HLO for 3x faster execution) overlaps the extract stage's
    decode/upload/device work instead of serializing in front of the first
    gate block. Pins the sticky block width FIRST (synchronously) so the
    real pass reuses the prewarmed shape. Returns the thread (or None on
    host-CPU backends, where jit compiles synchronously on this thread and
    nothing would overlap)."""
    import threading

    import jax

    if (jax.default_backend() == "cpu" or cfg.matching.pair_batch <= 1
            or cfg.matching.matcher != "mnn"):
        return None
    global _GATE_BLOCK_STICKY
    B = max(int(cfg.matching.pair_batch), 1)
    if n_images >= 128:   # edges ~ 8.4x images >= the 16*B doubling gate
        B = 2 * B
    if _GATE_BLOCK_STICKY is None:
        _GATE_BLOCK_STICKY = B
    B = _GATE_BLOCK_STICKY
    K = cfg.frontend.max_keypoints

    def _warm():
        try:
            rng = np.random.default_rng(0)
            d = jnp.asarray(rng.standard_normal((2, K, 128)).astype(np.float32))
            v = jnp.ones((2, K), jnp.float32)
            kp = jnp.asarray(rng.uniform(-200, 200, (2, K, 2)).astype(np.float32))
            ii = jnp.zeros((B,), jnp.int32)
            jj = jnp.ones((B,), jnp.int32)
            keys = jnp.asarray(np.asarray(
                jax.random.split(jax.random.PRNGKey(0), B)))
            out = _match_and_gate_block(
                d, v, kp, ii, jj, keys, cfg.camera.focal_length,
                cfg.matching.ransac_threshold_px, cfg.matching.ratio_threshold,
                cfg.sfm.ransac.num_hypotheses,
                five_point=cfg.sfm.ransac.use_five_point)
            np.asarray(out[:1, :1])  # hold the thread until compiled+run
        except Exception:
            pass  # prewarm is best-effort; the real pass compiles if needed

    t = threading.Thread(target=_warm, daemon=True, name="gate-prewarm")
    t.start()
    return t


def _lg_params_for(cfg) -> Optional[object]:
    """Device-resident LightGlue params for the configured matcher (memoized
    per weights path); None for the mutual-NN matcher."""
    if cfg.matching.matcher != "lightglue":
        return None
    path = cfg.matching.weights
    if not path:
        raise ValueError("matcher 'lightglue' needs MatchingConfig.weights "
                         "(torch checkpoint or converted .npz)")
    if path not in _LG_PARAMS_CACHE:
        from tpu3d.features.learned import load_matcher_params

        _LG_PARAMS_CACHE[path] = jax.tree_util.tree_map(
            jnp.asarray, load_matcher_params(path))
    return _LG_PARAMS_CACHE[path]


def _batch_match_pairs(feats, pairs, cfg, key, memo, verbose=False):
    """Match + E-gate the given (i, j) pairs (canonical i<j direction) in
    vmapped blocks, filling `memo` {(i, j): packed flat result}. Pairs
    already in the memo are skipped."""
    edges = sorted({(min(i, j), max(i, j)) for i, j in pairs if i != j}
                   - set(memo))
    if not edges:
        return memo
    lg_params = _lg_params_for(cfg)
    sizes_dev = None if lg_params is None else jnp.asarray(
        feats.image_size.astype(np.float32))
    B = max(int(cfg.matching.pair_batch), 1)
    if len(edges) >= 16 * B:
        # Large jobs (full-dataset scale: thousands of candidate edges):
        # double the block so the serial-latency-bound gate math amortizes
        # over more lanes. The measured "64 worse than 32" result was dead
        # padded slots at 159 edges — at >=16 blocks the tail slot waste
        # is <2% and per-block latency amortization wins.
        B = 2 * B
    # STICKY block size (r5): every later call in the process (retry /
    # 2-hop rescue) reuses the first call's vmap width — a different B is
    # a different program shape, and recompiling the fused match+gate
    # program costs ~40 s on the remote backend (the r5 full run measured
    # rescue_2hop at 45 s for a handful of fresh pairs, almost all of it
    # the B=32 recompile of a program the B=64 main pass already had).
    # Padding a small rescue job to one 64-wide block costs ~1.4 s of
    # device compute instead.
    global _GATE_BLOCK_STICKY
    if lg_params is None:
        if _GATE_BLOCK_STICKY is None:
            _GATE_BLOCK_STICKY = B
        else:
            B = _GATE_BLOCK_STICKY
    else:
        # 9-layer attention over 2048-kpt pairs: cap the vmapped block so
        # the (B, h, K, K) attention intermediates stay within HBM.
        B = min(B, 8)
    keys = np.asarray(jax.random.split(key, len(edges)))
    t0 = time.time()
    # Dispatch every block asynchronously FIRST, then fetch: JAX queues the
    # executions, so block k+1 computes while block k's result crosses the
    # tunnel — the synchronous dispatch-fetch-dispatch loop paid a full
    # round trip of idle device time per block.
    pending = []
    for s in range(0, len(edges), B):
        blk = edges[s : s + B]
        pad = B - len(blk)
        ii = np.array([e[0] for e in blk] + [blk[-1][0]] * pad, np.int32)
        jj = np.array([e[1] for e in blk] + [blk[-1][1]] * pad, np.int32)
        kb = keys[s : s + len(blk)]
        if pad:
            kb = np.concatenate([kb, np.tile(kb[-1:], (pad, 1))])
        pending.append((blk, _match_and_gate_block(
            feats.descriptors_dev, feats.valid_dev, feats.keypoints_dev,
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kb),
            cfg.camera.focal_length, cfg.matching.ransac_threshold_px,
            cfg.matching.ratio_threshold, cfg.sfm.ransac.num_hypotheses,
            five_point=cfg.sfm.ransac.use_five_point,
            sizes=sizes_dev, lg_params=lg_params,
        )))
    for n_done, (blk, flat_dev) in enumerate(pending):
        flat = np.asarray(flat_dev)
        _tick("match_block")
        for b, e in enumerate(blk):
            memo[e] = flat[b]
        if verbose and n_done % 8 == 0:
            done = min((n_done + 1) * B, len(edges))
            print(f"[match] gated {done}/{len(edges)} candidate edges "
                  f"({done / max(time.time() - t0, 1e-9):.1f} edges/s)", flush=True)
    return memo


def _precompute_pair_cache(feats, adj, cfg, key, verbose=True, memo=None):
    """Match + E-gate every candidate view-graph edge in vmapped blocks.
    memo: pre-filled results (run_extraction's sequential prematch) — those
    edges are skipped here."""
    pairs = [(i, j) for i in adj for j in adj.get(i, []) if i != j]
    return _batch_match_pairs(feats, pairs, cfg, key,
                              memo if memo is not None else {},
                              verbose=verbose)


def _decode_pair(feats, flat, i, j, reverse, cfg):
    """Unpack one cached canonical result into _match_one_pair's return
    tuple for direction (ref=i, new=j). reverse=True means the cache holds
    (j, i): mutual-NN matches are an unordered pair set, so the reversed
    view is an index permutation, and the relative pose inverts."""
    K = feats.keypoints.shape[1]
    per_kpt = flat[: K * 3].reshape(K, 3)
    idx1 = per_kpt[:, 0].astype(np.int64)
    mvalid = per_kpt[:, 1] > 0
    sel = per_kpt[:, 2] > 0
    n_raw = int(mvalid.sum())
    n_front = int(flat[K * 3 + 1])
    rel_R = flat[K * 3 + 2 : K * 3 + 11].reshape(3, 3).astype(np.float64)
    rel_t = flat[K * 3 + 11 : K * 3 + 14].astype(np.float64)
    if reverse:
        idx1_rev = np.zeros(K, np.int64)
        mvalid_rev = np.zeros(K, bool)
        sel_rev = np.zeros(K, bool)
        src = np.nonzero(mvalid)[0]
        dst = idx1[src]
        idx1_rev[dst] = src
        mvalid_rev[dst] = True
        sel_rev[dst] = sel[src]
        idx1, mvalid, sel = idx1_rev, mvalid_rev, sel_rev
        rel_R, rel_t = rel_R.T, -rel_R.T @ rel_t
    idx0 = np.arange(K)
    uv0 = feats.keypoints[i]
    uv1 = feats.keypoints[j][idx1]
    if n_raw < cfg.matching.min_raw_matches or n_front <= cfg.matching.min_inliers:
        return None, idx0, idx1, uv0, uv1, n_raw, n_front, None, None
    return sel, idx0, idx1, uv0, uv1, n_raw, n_front, rel_R, rel_t


def _match_pair_cached(feats, i, j, cfg, key, cache):
    """Cache-backed replacement for _match_one_pair (falls through to the
    live path on a miss, e.g. pair_batch=1)."""
    a, b = min(i, j), max(i, j)
    if cache is not None and (a, b) in cache:
        return _decode_pair(feats, cache[(a, b)], i, j, reverse=(i != a), cfg=cfg)
    return _match_one_pair(feats, i, j, cfg, key)


def _match_one_pair(feats, i, j, cfg, key):
    """Mutual-NN match + E-gate for one candidate pair. Returns
    (sel_mask, idx0, idx1, uv0, uv1, n_raw, n_front, rel_R, rel_t) — sel is
    None if the pair fails the raw-match or inlier gates. Descriptors and
    keypoints are sliced from device-resident tensors (no re-upload), and
    the whole result arrives in one packed download."""
    d = feats.descriptors_dev
    v = feats.valid_dev
    kp = feats.keypoints_dev
    K = d.shape[1]
    lg_params = _lg_params_for(cfg)
    lg = None if lg_params is None else (
        lg_params, jnp.asarray(feats.image_size[i].astype(np.float32)),
        jnp.asarray(feats.image_size[j].astype(np.float32)))
    flat = np.asarray(_match_and_gate_packed(
        d[i], d[j], v[i], v[j], kp[i], kp[j], key,
        cfg.camera.focal_length, cfg.matching.ransac_threshold_px,
        cfg.matching.ratio_threshold, cfg.sfm.ransac.num_hypotheses,
        five_point=cfg.sfm.ransac.use_five_point, lg=lg,
    ))
    _tick("match_single")
    per_kpt = flat[: K * 3].reshape(K, 3)
    idx1 = per_kpt[:, 0].astype(np.int64)
    mvalid = per_kpt[:, 1] > 0
    sel = per_kpt[:, 2] > 0
    n_raw = int(mvalid.sum())
    n_front = int(flat[K * 3 + 1])
    rel_R = flat[K * 3 + 2 : K * 3 + 11].reshape(3, 3)
    rel_t = flat[K * 3 + 11 : K * 3 + 14]
    idx0 = np.arange(K)
    uv0 = feats.keypoints[i]
    uv1 = feats.keypoints[j][idx1]
    if n_raw < cfg.matching.min_raw_matches or n_front <= cfg.matching.min_inliers:
        return None, idx0, idx1, uv0, uv1, n_raw, n_front, None, None
    return sel, idx0, idx1, uv0, uv1, n_raw, n_front, rel_R, rel_t


LAST_MATCH_TIMERS: Dict[str, float] = {}
LAST_EXTRACT_TIMERS: Dict[str, float] = {}


def run_matching(
    feats: ExtractedFeatures,
    adj: Dict[int, List[int]],
    cfg: PipelineConfig,
    seed: int = 1,
    verbose: bool = True,
    memo: Optional[Dict] = None,
) -> Tuple[List[ImageRegistration], TrackStore]:
    """BFS matching with interleaved acceptance and MULTI-REFERENCE edges.

    Like the reference (matching.py:84-189), the BFS frontier only grows
    when a new image's primary pair passes all gates — an image whose first
    candidate fails can still be reached later through another visited
    neighbor. Unlike the reference (which keeps exactly one (ref, new)
    edge, the root cause of its PnP fragility), every accepted image also
    matches against up to MAX_REFS - 1 additional already-visited
    neighbors; all passing edges feed the engine's joint PnP anchor set."""
    n_img, K = feats.keypoints.shape[:2]
    ts = TrackStore(n_img, K, capacity=cfg.sfm.max_tracks)
    key = jax.random.PRNGKey(seed)
    accepted: List[ImageRegistration] = []
    if not adj or all(len(v) == 0 for v in adj.values()):
        adj = {i: ([i - 1] if i else []) + ([i + 1] if i + 1 < n_img else []) for i in range(n_img)}
    key, ckey = jax.random.split(key)
    _t0 = time.time()
    cache = (_precompute_pair_cache(feats, adj, cfg, ckey, verbose=verbose,
                                    memo=memo)
             if cfg.matching.pair_batch > 1 else None)
    LAST_MATCH_TIMERS.clear()
    LAST_MATCH_TIMERS["gate_blocks"] = round(time.time() - _t0, 2)
    LAST_MATCH_TIMERS["n_edges"] = len(cache) if cache else 0
    _t0 = time.time()
    start = max(adj, key=lambda i: len(adj[i]))
    visited = {start}
    queue = [start]
    first = True
    qi = 0

    def make_edge(i, j, sel, idx0, idx1, uv0, uv1, rel_R, rel_t):
        track_sel = ts.union_pair(i, j, idx0[sel], idx1[sel])
        return EdgeObservations(
            ref_img=i,
            idx_ref=idx0[sel], idx_new=idx1[sel], track=track_sel,
            uv_ref=uv0[sel].astype(np.float32), uv_new=uv1[sel].astype(np.float32),
            colors_ref=feats.colors_bgr[i][idx0[sel]],
            rel_R=rel_R, rel_t=rel_t,
        )

    use_canonical = (cache is not None
                     and getattr(cfg.matching, "canonical_select", True))
    track_refs: set = set()   # images already carrying track unions
    if use_canonical:
        # ---- CANONICAL (order-free) edge selection (r5) ----
        # The BFS consume below picks each image's references by TRAVERSAL
        # ORDER, and the order itself depends on borderline gate outcomes:
        # the r5 gate-kernel A/B measured that ULP-level changes in the
        # E-gate numerics leave per-edge inlier counts intact (mean +0.7)
        # but reshuffle 27% of the selected edge set through order
        # amplification, and the engine's incremental cascade then loses
        # 6-11 cameras (287 -> 276..281 across five numerically-equal
        # variants). Here every decision is a pure function of the CACHED
        # per-edge results: references are ranked by cheirality-inlier
        # count (stable index tiebreak), the bootstrap pair is the
        # strongest passing edge, and images are emitted in capture order
        # — the engine's fixpoint retry already handles refs that register
        # later (engine.py: anchors need tracks, not registered refs).
        def decode(i, j):
            kk = jax.random.PRNGKey(0)  # unused on cache hits
            return _match_pair_cached(feats, i, j, cfg, kk, cache)

        passing = {}   # (ref, new) -> (n_front, n_raw), all directed pairs
        for (a, b) in cache:
            for i, j in ((a, b), (b, a)):
                sel, _, _, _, _, n_raw, n_front, rel_R, _ = decode(i, j)
                if sel is not None and rel_R is not None:
                    passing[(i, j)] = (int(n_front), int(n_raw))
        # Bootstrap: strongest passing pair-sized edge meeting the
        # first-pair inlier bar (the global frame/scale seed).
        boot = None
        for (i, j), (nf, nr) in sorted(passing.items(),
                                       key=lambda kv: (-kv[1][0], kv[0])):
            if nr < cfg.matching.min_pair_matches:
                continue
            sel, *_ = decode(i, j)
            if int(sel.sum()) >= cfg.matching.min_first_pair_inliers:
                boot = (i, j)
                break
        if boot is None:
            use_canonical = False   # degenerate set: legacy consume below
        else:
            by_new = {}
            for (w, jj), (nf, nr) in passing.items():
                by_new.setdefault(jj, []).append((-nf, w, nr))
            order = [boot[1]] + [v for v in range(n_img) if v != boot[1]]
            for j in order:
                cands = sorted(by_new.get(j, []))
                edges = []
                for negnf, w, nr in cands:
                    if len(edges) >= MAX_REFS:
                        break
                    if j == boot[1] and not edges and w != boot[0]:
                        continue   # the seed image's first edge IS the seed
                    sel, idx0, idx1, uv0, uv1, _, nf_, rR, rt = decode(w, j)
                    if not edges and j != boot[1]:
                        # The PRIMARY edge carries the legacy pair-size +
                        # track-overlap gates; the overlap gate only binds
                        # when the ref side already carries tracks (in
                        # order-free selection a ref may be processed
                        # later, and a zero-track ref would fail
                        # vacuously). Images with no gate-passing primary
                        # still keep their secondary edges — mirroring the
                        # legacy retry pass, which accepts on
                        # min_inliers alone.
                        if nr < cfg.matching.min_pair_matches:
                            pass_primary = False
                        else:
                            overlap = ts.overlap_fraction(
                                w, j, idx0[sel], idx1[sel])
                            pass_primary = (w not in track_refs
                                            or overlap >= cfg.matching.min_track_overlap)
                        if not pass_primary:
                            continue
                    edges.append(make_edge(w, j, sel, idx0, idx1, uv0, uv1,
                                           rR, rt))
                    track_refs.add(w)
                    track_refs.add(j)
                if edges:
                    accepted.append(ImageRegistration(img=j, edges=edges))
                    visited.add(j)
            visited.add(boot[0])
            first = len(accepted) == 0
            if verbose:
                print(f"[match] canonical selection: {len(accepted)} images, "
                      f"{sum(len(r.edges) for r in accepted)} edges "
                      f"(bootstrap {boot})", flush=True)
    while qi < len(queue) and not use_canonical:
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
            sel, idx0, idx1, uv0, uv1, n_raw, n_front, rel_R, rel_t = _match_pair_cached(feats, i, j, cfg, sub, cache)
            if sel is None:
                if verbose:
                    print(f"[match] ({i},{j}) rejected: raw={n_raw} front={n_front}", flush=True)
                continue
            # Pair-size gate (ref matching.py:160: len(idx0) >= 500).
            if n_raw < cfg.matching.min_pair_matches:
                if verbose:
                    print(f"[match] ({i},{j}) rejected: raw={n_raw} < min_pair_matches", flush=True)
                continue
            if first:
                # The bootstrap pair defines the global frame and scale —
                # demand a strong inlier set, not just a passing E-gate.
                if int(sel.sum()) < cfg.matching.min_first_pair_inliers:
                    if verbose:
                        print(f"[match] ({i},{j}) rejected: weak bootstrap ({int(sel.sum())} inliers)", flush=True)
                    continue
            else:
                overlap = ts.overlap_fraction(i, j, idx0[sel], idx1[sel])
                if overlap < cfg.matching.min_track_overlap:
                    if verbose:
                        print(f"[match] ({i},{j}) rejected: overlap {overlap:.2f}", flush=True)
                    continue
            edges = [make_edge(i, j, sel, idx0, idx1, uv0, uv1, rel_R, rel_t)]
            # Secondary reference edges: other already-visited neighbors.
            extra_refs = [w for w in adj[vtx] if w in visited and w != i][: MAX_REFS - 1]
            for w in extra_refs:
                key, sub = jax.random.split(key)
                sel2, i0b, i1b, u0b, u1b, _, nf2, rR2, rt2 = _match_pair_cached(feats, w, j, cfg, sub, cache)
                if sel2 is not None and nf2 > cfg.matching.min_inliers:
                    edges.append(make_edge(w, j, sel2, i0b, i1b, u0b, u1b, rR2, rt2))
            accepted.append(ImageRegistration(img=j, edges=edges))
            first = False
            visited.add(vtx)
            queue.append(vtx)
            if verbose:
                sizes = [len(e.idx_new) for e in edges]
                refs = [e.ref_img for e in edges]
                print(f"[match] img {j} accepted: refs {refs} edges {sizes}", flush=True)

    LAST_MATCH_TIMERS["bfs_consume"] = round(time.time() - _t0, 2)
    _t0 = time.time()
    # Retry pass: images the BFS never reached (their early candidates
    # failed a gate) get one more attempt against every visited neighbor
    # with only the E-gate applied — the engine's PnP decides registration.
    for vtx in range(n_img):
        if vtx in visited or first:
            continue
        edges = []
        for w in adj.get(vtx, []):
            if w not in visited or len(edges) >= MAX_REFS:
                continue
            key, sub = jax.random.split(key)
            sel2, i0b, i1b, u0b, u1b, _, nf2, rR2, rt2 = _match_pair_cached(feats, w, vtx, cfg, sub, cache)
            if sel2 is not None and nf2 > cfg.matching.min_inliers:
                edges.append(make_edge(w, vtx, sel2, i0b, i1b, u0b, u1b, rR2, rt2))
        if edges:
            accepted.append(ImageRegistration(img=vtx, edges=edges))
            visited.add(vtx)
            if verbose:
                print(f"[match] img {vtx} accepted on retry: refs {[e.ref_img for e in edges]}", flush=True)
    LAST_MATCH_TIMERS["retry_pass"] = round(time.time() - _t0, 2)
    _t0 = time.time()
    # Last-chance 2-hop rescue: an image can stay unreached because its
    # DIRECT retrieval neighbors are themselves unvisited or fail the
    # E-gate, while a visited image two hops away in the view graph still
    # overlaps it (the retrieval top-k is a lossy similarity snapshot).
    # Gather visited 2-hop candidates for every still-missing image, gate
    # them in one batched dispatch, and accept edges like the retry pass.
    missing = [v_ for v_ in range(n_img) if v_ not in visited and not first]
    if missing and cache is not None and cfg.matching.rescue_candidates > 0:
        cand_map: Dict[int, List[int]] = {}
        fresh_pairs = []
        for vtx in missing:
            direct = set(adj.get(vtx, []))
            cands: List[int] = [w for w in adj.get(vtx, []) if w in visited]
            for w in adj.get(vtx, []):
                for w2 in adj.get(w, []):
                    if (w2 != vtx and w2 in visited and w2 not in direct
                            and w2 not in cands):
                        cands.append(w2)
            cands = cands[: cfg.matching.rescue_candidates]
            cand_map[vtx] = cands
            for w in cands:
                e = (min(w, vtx), max(w, vtx))
                if e not in cache:
                    fresh_pairs.append(e)
        LAST_MATCH_TIMERS["rescue_missing"] = len(missing)
        LAST_MATCH_TIMERS["rescue_fresh"] = len(fresh_pairs)
        if fresh_pairs:
            _batch_match_pairs(feats, fresh_pairs, cfg, key, cache,
                               verbose=False)
        for vtx in missing:
            edges = []
            for w in cand_map[vtx]:
                if len(edges) >= MAX_REFS:
                    break
                key, sub = jax.random.split(key)
                sel2, i0b, i1b, u0b, u1b, _, nf2, rR2, rt2 = _match_pair_cached(
                    feats, w, vtx, cfg, sub, cache)
                if sel2 is not None and nf2 > cfg.matching.min_inliers:
                    edges.append(make_edge(w, vtx, sel2, i0b, i1b, u0b, u1b,
                                           rR2, rt2))
            if edges:
                accepted.append(ImageRegistration(img=vtx, edges=edges))
                visited.add(vtx)
                if verbose:
                    print(f"[match] img {vtx} accepted on 2-hop rescue: "
                          f"refs {[e.ref_img for e in edges]}", flush=True)
    LAST_MATCH_TIMERS["rescue_2hop"] = round(time.time() - _t0, 2)
    LAST_MATCH_TIMERS["unmatched"] = sorted(
        v_ for v_ in range(n_img) if v_ not in visited)
    return accepted, ts


# Observability: the most recent incremental run's engine phase timers
# (bench.py and batch drivers report them without needing verbose logs).
LAST_SFM_TIMERS: Dict[str, object] = {}


def _sfm_device_ctx(sfm_cfg):
    """Placement context for the incremental engine's dispatches.

    SfMConfig.backend == "cpu" pins the registration/BA kernels to the
    HOST CPU backend while extraction/matching stay on the accelerator:
    the engine's per-step problems are small (~10 ms of compute) but each
    dispatch over the remote-TPU tunnel pays a ~67 ms round trip — at
    24-image scale the reconstruct stage is RTT-bound, not compute-bound
    (BENCH r3: pnp 0.95 s + host 0.67 s of mostly-latency). Latency-bound
    kernels belong on the host; throughput kernels on the TPU.
    "hybrid" = CPU registration with the windowed/global BA solves lifted
    back to the accelerator (engine._ba_device_ctx); "auto" = hybrid on
    accelerator sessions, default otherwise."""
    import contextlib

    import jax

    from tpu3d.config import resolve_sfm_backend

    backend = resolve_sfm_backend(getattr(sfm_cfg, "backend", "default"))
    if backend in ("cpu", "hybrid"):
        return jax.default_device(jax.devices("cpu")[0])
    return contextlib.nullcontext()


def run_reconstruction(
    feats: ExtractedFeatures,
    registrations: List[ImageRegistration],
    ts: TrackStore,
    cfg: PipelineConfig,
    verbose: bool = True,
    adj: Optional[Dict[int, List[int]]] = None,
    seed: int = 3,
) -> Reconstruction:
    with _sfm_device_ctx(cfg.sfm):
        return _run_reconstruction_impl(feats, registrations, ts, cfg,
                                        verbose, adj, seed)


def _run_reconstruction_impl(
    feats: ExtractedFeatures,
    registrations: List[ImageRegistration],
    ts: TrackStore,
    cfg: PipelineConfig,
    verbose: bool = True,
    adj: Optional[Dict[int, List[int]]] = None,
    seed: int = 3,
) -> Reconstruction:
    engine = IncrementalSfM(n_images=len(feats.names), config=cfg.sfm)
    pending = list(registrations)
    for reg in pending:
        # Canonicalize track ids (unions may have merged since creation).
        for e in reg.edges:
            e.track = ts.resolve(e.track)
    # Tighten the triangulation capacity to the real data before any
    # registration compiles (engine.set_edge_cap): the padded edge axis is
    # the register chunk's dominant cost. Bucket by the 99th-percentile
    # edge size, not the max — on the full dataset a handful of 1.1-1.2k-
    # match edges would otherwise force the 2048 bucket for everyone; the
    # commit path truncates oversize edges safely (accept masks are [:cap],
    # and their tail matches still triangulate through other edges).
    sizes = [len(e.idx_new) for r in pending for e in r.edges]
    if sizes:
        # p90: on the full dataset p99 is 1061 (just over the 1024 bucket)
        # while p90 is ~819 — the p90 bucket halves the padded axis and
        # truncates only the densest tenth of edges, which carry far more
        # matches than triangulation needs.
        engine.set_edge_cap(int(np.percentile(sizes, 90)))
    pending = _symmetrize_weak_registrations(pending, feats, verbose)
    # Pre-size the global-BA shapes from the exact match-graph bounds so
    # the whole run solves on ONE executable at ~the real problem size
    # (see IncrementalSfM.presize_global_ba for the measured failure modes
    # of guessing). Edge sides are truncated to the edge cap exactly like
    # the commit path, so the bound is tight.
    cap = engine._edge_cap
    K = engine._K
    keys, tracks = [], []
    for r in pending:
        for e in r.edges:
            keys.append(np.asarray(e.idx_new[:cap], np.int64) + r.img * K)
            keys.append(np.asarray(e.idx_ref[:cap], np.int64)
                        + e.ref_img * K)
            tracks.append(np.asarray(e.track[:cap], np.int64))
    if keys:
        engine.presize_global_ba(
            int(len(np.unique(np.concatenate(keys)))),
            int(len(np.unique(np.concatenate(tracks)))))
    # Fixpoint retry: an image whose references register later in the pass
    # (or whose anchor tracks get triangulated later) succeeds on a
    # subsequent round — the matching-stage order is similarity-driven, not
    # dependency-driven.
    # (64 is a cap, not a target: the loop breaks at its no-progress
    # fixpoint, and a chain segment re-growing off one late-registering
    # bridge can legitimately need dozens of rounds.)
    batch = max(int(cfg.sfm.register_batch), 1)
    for round_ in range(64):
        failed = []
        # Chunked frontier registration: one fused PnP+triangulation
        # dispatch per `batch` images (intra-chunk anchor staleness
        # resolves on the next fixpoint round, same as cross-round
        # dependencies).
        infos = engine.register_batch(pending, batch=batch)
        for reg, info in zip(pending, infos):
            if verbose:
                print(f"[sfm] {info}", flush=True)
            if info.get("status") != "registered":
                failed.append(reg)
        if not failed:
            break
        if len(failed) == len(pending):
            # A batched round can stall on intra-chunk staleness that a
            # strictly sequential pass would resolve — downgrade to
            # batch=1 for one round before declaring the fixpoint.
            if batch > 1:
                batch = 1
                if verbose:
                    print("[sfm] no batched progress — sequential fallback round", flush=True)
                continue
            break
        batch = max(int(cfg.sfm.register_batch), 1)
        pending = failed
        if verbose:
            print(f"[sfm] retry round {round_ + 1}: {len(pending)} images", flush=True)

    if adj:
        rescued = _rescue_pass(engine, feats, ts, adj, cfg, verbose, seed)
        registrations = list(registrations) + rescued
    # Optional edge-consistency gate (cfg.sfm.edge_consistency_gate; OFF
    # by default — see the config for the measured reason): checks each
    # camera LOCALLY against its own two-view relative poses. A global
    # check against averaged poses cannot work here at all — rotation
    # averaging drifts ~sqrt(graph diameter) x edge noise (~14 deg on
    # this dataset), swamping real errors.
    if cfg.sfm.edge_consistency_gate:
        dropped = _edge_consistency_gate(engine, registrations, verbose)
        if dropped and adj:
            _rescue_pass(engine, feats, ts, adj, cfg, verbose, seed + 1,
                         rounds=3, deregister_round=99)
    rec = engine.finalize(feats.names, registrations=registrations,
                          verbose=verbose)
    global LAST_SFM_TIMERS
    LAST_SFM_TIMERS = {**{k: round(v, 2) for k, v in engine.timers.items()},
                       "calls": dict(engine.counters),
                       "edge_cap": engine._edge_cap}
    if verbose:
        import json as _json

        print("[sfm] phase seconds: "
              + _json.dumps({k: round(v, 1) for k, v in engine.timers.items()})
              + " calls: " + _json.dumps(engine.counters),
              flush=True)
    return rec


def _symmetrize_weak_registrations(registrations, feats,
                                   verbose: bool, weak_total: int = 100):
    """Mine REVERSE edges for images the BFS left weakly anchored.

    The matching BFS attaches each accepted edge to the LATER-visited
    endpoint, so an image reached early through one weak edge can sit on a
    single 11-match anchor while its strong edges (hundreds of inliers)
    live on its neighbours' records pointing back at it (measured: img 225
    anchored on 11 matches while edges (224,225)/(225,226) carried 619/955
    front inliers on the neighbours' side — unregistrable as stored).
    For every image whose own edges total < weak_total matches, reversed
    copies of the strongest incoming edges are appended up to MAX_REFS."""
    by_img = {r.img: r for r in registrations}
    incoming: Dict[int, list] = {}
    for r in registrations:
        for e in r.edges:
            incoming.setdefault(e.ref_img, []).append((r.img, e))
    out = list(registrations)
    for j, inc in incoming.items():
        reg = by_img.get(j)
        own = sum(len(e.idx_new) for e in reg.edges) if reg else 0
        if own >= weak_total:
            continue
        have = {e.ref_img for e in reg.edges} if reg else set()
        inc = sorted(inc, key=lambda t: -len(t[1].idx_new))
        added = 0
        for other, e in inc:
            if other in have or (reg and len(reg.edges) >= MAX_REFS):
                continue
            rev = EdgeObservations(
                ref_img=other,
                idx_ref=e.idx_new, idx_new=e.idx_ref, track=e.track,
                uv_ref=e.uv_new, uv_new=e.uv_ref,
                colors_ref=feats.colors_bgr[other][e.idx_ref],
                rel_R=(None if e.rel_R is None else np.asarray(e.rel_R).T),
                rel_t=(None if e.rel_R is None
                       else -np.asarray(e.rel_R).T @ np.asarray(e.rel_t)),
            )
            if reg is None:
                reg = ImageRegistration(img=j, edges=[])
                by_img[j] = reg
                out.append(reg)
            reg.edges.append(rev)
            have.add(other)
            added += 1
        if added and verbose:
            print(f"[sfm] img {j}: +{added} reverse edges "
                  f"(own anchors {own} matches)", flush=True)
    return out


def _edge_consistency_gate(
    engine, registrations, verbose: bool,
    rot_thr_deg: float = 12.0, dir_thr_deg: float = 35.0,
    min_edges: int = 2,
) -> int:
    """Deregister cameras whose estimated pose disagrees with the MAJORITY
    of their own measured edges: per edge (i, j), compare R_j R_iᵀ with
    the E-gate's rel_R (geodesic angle) and the estimated baseline
    direction C_j − C_i with −R_jᵀ rel_t. Per-camera medians over its
    edges make single outlier edges harmless. Returns #dropped."""
    from tpu3d.core import lie

    n = engine.n_images
    rot_errs: Dict[int, List[float]] = {}
    dir_errs: Dict[int, List[float]] = {}
    R_cache: Dict[int, np.ndarray] = {}
    C_cache: Dict[int, np.ndarray] = {}

    def RC(i):
        if i not in R_cache:
            R_cache[i] = lie.so3_exp_np(engine.cams[i, :3])
            C_cache[i] = -R_cache[i].T @ engine.cams[i, 3:6]
        return R_cache[i], C_cache[i]

    for reg in registrations:
        j = reg.img
        if not engine.has_cam[j]:
            continue
        for e in reg.edges:
            i = e.ref_img
            if e.rel_R is None or not engine.has_cam[i]:
                continue
            Ri, Ci = RC(i)
            Rj, Cj = RC(j)
            dR = (Rj @ Ri.T) @ np.asarray(e.rel_R).T
            ang = np.degrees(np.linalg.norm(lie.so3_log_np(dR)))
            b = Cj - Ci
            nb = np.linalg.norm(b)
            d = -Rj.T @ np.asarray(e.rel_t)
            nd = np.linalg.norm(d)
            if nb > 1e-9 and nd > 1e-9:
                dang = np.degrees(np.arccos(np.clip(b @ d / nb / nd, -1, 1)))
            else:
                dang = 0.0
            for img in (i, j):
                rot_errs.setdefault(img, []).append(ang)
                dir_errs.setdefault(img, []).append(dang)

    dropped = 0
    for img in np.flatnonzero(engine.has_cam):
        re_ = rot_errs.get(int(img), [])
        if len(re_) < min_edges:
            continue
        if (float(np.median(re_)) > rot_thr_deg
                or float(np.median(dir_errs[int(img)])) > dir_thr_deg):
            engine.has_cam[img] = False
            engine.num_registered -= 1
            sl = slice(int(img) * engine._K, (int(img) + 1) * engine._K)
            engine.obs_valid[sl] = 0
            dropped += 1
    if verbose and dropped:
        print(f"[sfm] edge consistency gate dropped {dropped} cameras", flush=True)
    if dropped:
        engine.global_ba()
    return dropped


def _rescue_pass(engine, feats, ts, adj, cfg, verbose: bool, seed: int = 3,
                 rounds: int = 64, deregister_round: int = 2):
    """Re-matching rescue: the matching stage only ever pairs a new image
    with already-VISITED neighbors; an image whose visited refs never
    REGISTERED is stuck with useless edges. Re-match such images directly
    against registered adjacency neighbors (fresh edges, fresh tracks),
    then register. Iterates to a FIXPOINT (stops when a round makes no
    progress): when a whole chain segment hangs off one bridge image that
    failed in the main pass, the frontier re-grows only a few images per
    round, and a fixed small round count strands the rest of the segment
    (measured: ~90 cameras on ystad_kloster). No attempt is skipped on
    "unchanged inputs" — an attempt can succeed with an unchanged
    reference set because OTHER registrations triangulated more of its
    anchor tracks in between; the no-progress break bounds total work.
    Mid-way, weak cameras are deregistered so their slots get
    re-attempted with fresh edges. Returns the list of rescue
    ImageRegistrations (for consistency gating)."""
    key = jax.random.PRNGKey(seed)
    rescued: List[ImageRegistration] = []
    batch = max(int(cfg.sfm.register_batch), 1)
    # Per-rescue memo of match+gate results: rounds retry REGISTRATION
    # with evolving track state, but the pair-level E-gate is
    # deterministic per key — one batched computation per pair covers
    # every round (the old per-round, per-pair dispatches dominated
    # full-run rescue wall-clock).
    memo: Dict[Tuple[int, int], np.ndarray] = {}
    for rescue_round in range(rounds):
        if rescue_round == deregister_round:
            dropped = engine.deregister_weak_cameras()
            if dropped and verbose:
                print(f"[sfm] deregistered {len(dropped)} weak cameras "
                      f"mid-rescue: {dropped}", flush=True)
        todo = [v for v in range(len(feats.names)) if not engine.has_cam[v]]
        ref_sets = {
            v: [r for r in adj.get(v, []) if engine.has_cam[r]][: MAX_REFS]
            for v in todo
        }
        key, bkey = jax.random.split(key)
        _batch_match_pairs(
            feats, [(r, v) for v in todo for r in ref_sets[v]], cfg, bkey, memo)
        progressed = 0
        round_regs = []
        for v in todo:
            refs = ref_sets[v]
            if not refs:
                continue
            edges = []
            for r in refs:
                a, b = min(r, v), max(r, v)
                sel, i0, i1, u0, u1, _, nf, rR, rt = _decode_pair(
                    feats, memo[(a, b)], r, v, reverse=(r != a), cfg=cfg)
                if sel is not None and nf > cfg.matching.min_inliers:
                    track_sel = ts.union_pair(r, v, i0[sel], i1[sel])
                    edges.append(EdgeObservations(
                        ref_img=r, idx_ref=i0[sel], idx_new=i1[sel],
                        track=ts.resolve(track_sel),
                        uv_ref=u0[sel].astype(np.float32),
                        uv_new=u1[sel].astype(np.float32),
                        colors_ref=feats.colors_bgr[r][i0[sel]],
                        rel_R=rR, rel_t=rt,
                    ))
            if not edges:
                continue
            round_regs.append(ImageRegistration(img=v, edges=edges))
        infos = engine.register_batch(round_regs, batch=batch)
        for reg_v, info in zip(round_regs, infos):
            if info.get("status") == "registered":
                progressed += 1
                rescued.append(reg_v)
            if verbose:
                print(f"[sfm-rescue] {info}", flush=True)
        if verbose:
            print(f"[sfm] rescue round {rescue_round}: +{progressed} registered", flush=True)
        if progressed == 0:
            # Same staleness guard as the main fixpoint: one sequential
            # round before giving up.
            if batch > 1:
                batch = 1
                continue
            break
        batch = max(int(cfg.sfm.register_batch), 1)
    return rescued


def run_global_reconstruction(
    feats: ExtractedFeatures,
    registrations: List[ImageRegistration],
    ts: TrackStore,
    cfg: PipelineConfig,
    verbose: bool = True,
    adj: Optional[Dict[int, List[int]]] = None,
    seed: int = 3,
) -> Reconstruction:
    """Global-SfM mode: pose-graph initialization (rotation + translation
    averaging over ALL pairwise relative poses) instead of incremental
    chaining, then joint triangulation and global BA. Immune to the
    chain's scale-drift islands; the integrity gates still prune
    stragglers. Cameras outside the pose-graph component (or dropped by
    the integrity gates) are then PnP-registered against the trusted
    backbone — and, when `adj` is given, re-matched in a rescue pass —
    combining global coherence with incremental recall."""
    from tpu3d.sfm.posegraph import pose_graph_init

    with _sfm_device_ctx(cfg.sfm):
        return _run_global_impl(feats, registrations, ts, cfg, verbose, adj,
                                seed, pose_graph_init)


def _run_global_impl(feats, registrations, ts, cfg, verbose, adj, seed,
                     pose_graph_init):
    n = len(feats.names)
    edges, rel_R, rel_t = [], [], []
    for reg in registrations:
        for e in reg.edges:
            e.track = ts.resolve(e.track)
            if e.rel_R is not None:
                edges.append((e.ref_img, reg.img))
                rel_R.append(np.asarray(e.rel_R, np.float64))
                rel_t.append(np.asarray(e.rel_t, np.float64))
    cams, has_cam, mask = pose_graph_init(n, edges, rel_R, rel_t)
    if verbose:
        print(f"[sfm-global] pose graph: {int(mask.sum())}/{n} cameras in the "
              f"largest component over {len(edges)} edges", flush=True)

    engine = IncrementalSfM(n_images=n, config=cfg.sfm)
    engine.cams[:] = cams
    engine.has_cam[:] = has_cam
    engine.num_registered = int(has_cam.sum())
    f = engine.focal

    # Joint triangulation: every edge whose endpoints both have cameras.
    n_new_total = 0
    for reg in registrations:
        for e in reg.edges:
            if not (engine.has_cam[e.ref_img] and engine.has_cam[reg.img]):
                continue
            tr = np.clip(e.track, 0, engine.points.shape[0] - 1)
            new = (e.track >= 0) & ~engine.point_valid[tr]
            from tpu3d.sfm.engine import EDGE_CAP, _pad, _triangulate_and_gate

            m = min(len(e.idx_new), EDGE_CAP)
            # Very loose reprojection gate (~50px): pose-graph poses are
            # coarse; Huber BA + residual pruning clean up afterwards.
            X_new, good = _triangulate_and_gate(
                jnp.asarray(engine.cams[e.ref_img]), jnp.asarray(engine.cams[reg.img]),
                jnp.asarray(_pad(e.uv_ref.astype(np.float32) / f, EDGE_CAP)),
                jnp.asarray(_pad(e.uv_new.astype(np.float32) / f, EDGE_CAP)),
                f, 25.0 * cfg.sfm.ransac.threshold_px,
            )
            accept = np.zeros(len(e.idx_new), bool)
            accept[:m] = np.asarray(good)[:m] & new[:m]
            if accept.any():
                ids = e.track[accept]
                engine.points[ids] = np.asarray(X_new)[:m][accept[:m]]
                engine.point_valid[ids] = True
                engine.point_color[ids] = e.colors_ref[accept]
                n_new_total += int(accept.sum())
            live = (e.track >= 0) & engine.point_valid[tr]
            if live.any():
                engine._record_obs(e.ref_img, e.idx_ref[live], e.track[live], e.uv_ref[live])
                engine._record_obs(reg.img, e.idx_new[live], e.track[live], e.uv_new[live])
    if verbose:
        print(f"[sfm-global] triangulated {n_new_total} points", flush=True)
    # Pose-graph initializations are coarse: several BA+prune rounds.
    for _ in range(3):
        engine.global_ba()

    # ---- recall phase: register everything the backbone missed ----
    # PnP against the (now BA-refined) global structure using the edges
    # the matching stage already has; fixpoint like run_reconstruction.
    pending = [r for r in registrations if not engine.has_cam[r.img]]
    for round_ in range(4):
        failed = []
        for reg in pending:
            info = engine.register_image(reg)
            if verbose:
                print(f"[sfm-global] {info}", flush=True)
            if info.get("status") != "registered":
                failed.append(reg)
        if not failed or len(failed) == len(pending):
            break
        pending = failed
    engine.global_ba()
    if adj:
        _rescue_pass(engine, feats, ts, adj, cfg, verbose, seed)
    return engine.finalize(feats.names)


def reconstruct(
    img_dir: str,
    cfg: Optional[PipelineConfig] = None,
    names: Optional[List[str]] = None,
    downscale: int = 1,
    verbose: bool = True,
    mode: str = "incremental",
) -> Tuple[Reconstruction, Dict[str, float]]:
    """Full pipeline. Returns (reconstruction, stage timings in seconds).
    mode: "incremental" (chain registration) or "global" (pose-graph
    backbone + PnP recall)."""
    from tpu3d.utils.trace import trace_span

    cfg = cfg or PipelineConfig()
    timings: Dict[str, float] = {}
    t0 = time.time()
    memo: Dict = {}
    n_img_hint = len(names) if names else 0
    prewarm_gate_async(cfg, n_img_hint)
    with trace_span("extract", sync=True, images=len(names) if names else -1):
        feats = run_extraction(
            img_dir, cfg, names, downscale, verbose,
            prematch_memo=memo if cfg.matching.prematch else None)
    timings["extract"] = time.time() - t0
    t0 = time.time()
    with trace_span("retrieve", sync=True):
        adj = run_retrieval(feats, cfg)
    timings["retrieve"] = time.time() - t0
    t0 = time.time()
    with trace_span("match", sync=True):
        pairs, ts = run_matching(feats, adj, cfg, verbose=verbose, memo=memo)
    timings["match"] = time.time() - t0
    t0 = time.time()
    with trace_span("reconstruct", sync=True, mode=mode):
        if mode == "global":
            rec = run_global_reconstruction(feats, pairs, ts, cfg, verbose=verbose, adj=adj)
        else:
            rec = run_reconstruction(feats, pairs, ts, cfg, verbose=verbose, adj=adj)
    timings["reconstruct"] = time.time() - t0
    timings["total"] = sum(timings.values())
    return rec, timings
