"""Incremental SfM engine — multi-reference image registration.

The registration chain is inherently sequential (each image depends on all
previously triangulated tracks — ref sfm.py:101-131), so the *loop* lives
on the host; everything *inside* a step is a fixed-shape jitted kernel:

  per image:  PnP-RANSAC over the union of known tracks from ALL matched
              reference edges → per-edge batched DLT triangulation with
              two-view cheirality + reprojection gating → local Schur-LM
              BA of the new camera + its new points against every edge
  periodic:   global Schur-LM BA over all registered cameras + tracks

Differences from the reference, by design (strictly stronger):
  - an image is anchored by MULTIPLE reference views (the reference PnPs
    against a single pair's tracks, sfm.py:116 — the dominant failure mode
    on sparse view graphs);
  - pair BA uses both views' residuals with reference cameras frozen (the
    reference projects only into the new camera, sfm.py:87-91);
  - a *global* BA exists (the reference has none);
  - new-point acceptance = cheirality in both final cameras + reprojection
    gate, instead of the relative-pose-only mask of sfm.py:118.

E-matrix gating already happened in the matching stage (as in the
reference, matching.py:134-144) — edges arrive inlier-filtered with the
relative pose attached, so the engine never re-runs E-RANSAC (the
reference runs it twice).

All device buffers are padded to fixed capacities (PNP_CAP / EDGE_CAP /
BA_CAP) so every kernel compiles exactly once per run.
"""
from __future__ import annotations

import dataclasses
import functools
import itertools
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.utils.dispatch import tick as _tick
from tpu3d.ba.lm import bundle_adjust
from tpu3d.ba.residuals import reprojection_residuals
from tpu3d.config import SfMConfig
from tpu3d.core import lie
from tpu3d.geometry.pnp import pnp_ransac
from tpu3d.geometry.triangulate import refine_triangulation_gn, triangulate_dlt
from tpu3d.sfm.scene import Reconstruction

PNP_CAP = 4096    # max known-track anchors per image registration
EDGE_CAP = 2048   # max inlier matches per edge (= keypoint budget)
BA_CAP_P = 4096   # max points in the local BA
BA_CAP_O = 8192   # max observations in the local BA
MAX_REFS = 3      # reference views per image

# Backend-divergence forensics: when TPU3D_DUMP_REGISTER names a directory,
# every fused register step's device inputs + fetched outputs are saved so
# benchmarks/register_replay_probe.py can replay the IDENTICAL inputs on
# another backend and diff the PnP/triangulation gate decisions per call
# (the registration chain is sequential, so live CPU-vs-TPU runs diverge
# after the first flipped gate and stop being comparable).
_DUMP_DIR = os.environ.get("TPU3D_DUMP_REGISTER", "")
_dump_seq = itertools.count()


@dataclasses.dataclass
class EdgeObservations:
    """Inlier matches of one (registered_ref, new) image edge, produced by
    the matching stage. Variable-length host arrays (M,)."""

    ref_img: int
    idx_ref: np.ndarray
    idx_new: np.ndarray
    track: np.ndarray       # resolved global track ids
    uv_ref: np.ndarray      # (M, 2) centered coords
    uv_new: np.ndarray
    colors_ref: np.ndarray  # (M, 3) uint8 BGR sampled at ref keypoints
    rel_R: Optional[np.ndarray] = None  # world->new given ref=I (from E)
    rel_t: Optional[np.ndarray] = None


@dataclasses.dataclass
class ImageRegistration:
    img: int
    edges: List[EdgeObservations]


# Backwards-compatible alias used by older tests/callers.
@dataclasses.dataclass
class PairObservations:
    img0: int
    img1: int
    idx0: np.ndarray
    idx1: np.ndarray
    track: np.ndarray
    uv0: np.ndarray
    uv1: np.ndarray
    valid: np.ndarray
    colors0: np.ndarray
    rel_R: Optional[np.ndarray] = None
    rel_t: Optional[np.ndarray] = None

    def to_registration(self) -> ImageRegistration:
        sel = self.valid
        return ImageRegistration(
            img=self.img1,
            edges=[EdgeObservations(
                ref_img=self.img0,
                idx_ref=self.idx0[sel], idx_new=self.idx1[sel],
                track=self.track[sel],
                uv_ref=self.uv0[sel], uv_new=self.uv1[sel],
                colors_ref=self.colors0[sel],
                rel_R=self.rel_R, rel_t=self.rel_t,
            )],
        )


@jax.jit
def _triangulate_and_gate(cam_i, cam_j, uv0n, uv1n, focal, thr_px):
    """DLT + quality gate: positive depth in both views and reprojection
    error below threshold in both views."""
    with jax.default_matmul_precision("float32"):
        return _triangulate_and_gate_body(cam_i, cam_j, uv0n, uv1n, focal, thr_px)


def _register_step_body(key, Xk, uvk, wk, pnp_thr, cams_i, uv_r, uv_n, focal,
                        tri_thr_px, num_hypotheses):
    """Fused registration interior: PnP-RANSAC for camera j, then batched
    per-edge DLT triangulation + gating against the PnP pose — ONE device
    dispatch per registered image (on a remote-TPU backend each extra
    dispatch is a network round trip; this was two)."""
    from tpu3d.geometry.pnp import pnp_ransac

    with jax.default_matmul_precision("float32"):
        R, t, _inl, cnt = pnp_ransac(key, Xk, uvk, wk, pnp_thr,
                                     num_hypotheses=num_hypotheses)
        cam_j = jnp.concatenate([lie.so3_log(R), t]).astype(jnp.float32)
        X_all, good_all = jax.vmap(
            lambda ci, u0, u1: _triangulate_and_gate_body(
                ci, cam_j, u0, u1, focal, tri_thr_px)
        )(cams_i, uv_r, uv_n)
    return cam_j, cnt, X_all, good_all


_register_step = functools.partial(jax.jit, static_argnames=("num_hypotheses",))(
    _register_step_body)


@functools.partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def _local_ba_batch(cams0, pts, ci, pi, uv, w, cf, pf, max_iters, cg_iters):
    """vmapped local BA: one dispatch refines a whole registration chunk's
    cameras + fresh points (fixed shapes; batched while_loop runs until the
    slowest problem's LM early-exit)."""
    from tpu3d.ba.lm import _bundle_adjust_body

    with jax.default_matmul_precision("float32"):
        st = jax.vmap(
            lambda a, b, c, d, e, f_, g, h: _bundle_adjust_body(
                a, b, c, d, e, f_, g, h, max_iters, cg_iters, 1e-3, None,
                1e-3, 1e-4)
        )(cams0, pts, ci, pi, uv, w, cf, pf)
    return st.cams, st.points


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _register_step_batch(keys, Xk, uvk, wk, pnp_thr, cams_i, uv_r, uv_n,
                         focal, tri_thr_px, num_hypotheses):
    """A frontier CHUNK of registrations in one dispatch: vmap of the fused
    PnP+triangulation step over the image axis. Independent images in a
    BFS layer don't need each other's results inside one fixpoint round —
    batching turns ~200 ms of per-image tunnel round trip into one trip
    per chunk (the staleness this introduces is exactly what the round
    loop's no-progress fixpoint already handles)."""
    return jax.vmap(
        lambda k, x, u, w, ci, ur, un: _register_step_body(
            k, x, u, w, pnp_thr, ci, ur, un, focal, tri_thr_px,
            num_hypotheses)
    )(keys, Xk, uvk, wk, cams_i, uv_r, uv_n)


@jax.jit
def _prune_mask(cams, points, cam_idx, pt_idx, uv, w, focal, thr_px):
    """BA outlier mask on device: True where a live observation reprojects
    beyond thr_px. Returns (O,) uint8 so only O bytes cross the tunnel."""
    r = reprojection_residuals(cams, points, cam_idx, pt_idx, uv, w)
    err_px = jnp.linalg.norm(r, axis=-1) * focal
    return ((err_px > thr_px) & (w > 0)).astype(jnp.uint8)


@jax.jit
def _triangulate_and_gate_pairs(cams_i, cams_j, uv0n, uv1n, focal, thr_px):
    """Catch-up triangulation across IMAGES: each row is an independent
    (ref_cam, new_cam, matches) edge — used once per registration chunk for
    edges whose references registered inside the same chunk."""
    with jax.default_matmul_precision("float32"):
        return jax.vmap(
            lambda ci, cj, u0, u1: _triangulate_and_gate_body(
                ci, cj, u0, u1, focal, thr_px)
        )(cams_i, cams_j, uv0n, uv1n)


@jax.jit
def _triangulate_and_gate_edges(cams_i, cam_j, uv0n, uv1n, focal, thr_px):
    """All of one image's edges in ONE device call (cams_i: (E, 6),
    uv: (E, CAP, 2)) — on a remote-TPU backend every extra dispatch is a
    network round trip, and registration makes one per edge otherwise."""
    with jax.default_matmul_precision("float32"):
        return jax.vmap(
            lambda ci, u0, u1: _triangulate_and_gate_body(ci, cam_j, u0, u1, focal, thr_px)
        )(cams_i, uv0n, uv1n)


def _triangulate_and_gate_body(cam_i, cam_j, uv0n, uv1n, focal, thr_px):
    Ri = lie.so3_exp(cam_i[:3])
    Rj = lie.so3_exp(cam_j[:3])
    ti = cam_i[3:6]
    tj = cam_j[3:6]
    X = triangulate_dlt(Ri, ti, Rj, tj, uv0n, uv1n)
    # GN polish decouples the accept/reject gate from eigh backend noise:
    # TPU vs CPU eigh differ in the last bits, which measurably flipped
    # chain-registration decisions; after 2 damped GN steps both backends
    # sit at the same reprojection optimum.
    X = refine_triangulation_gn(Ri, ti, Rj, tj, uv0n, uv1n, X, iters=2)
    Xci = jnp.einsum("ij,nj->ni", Ri, X) + ti
    Xcj = jnp.einsum("ij,nj->ni", Rj, X) + tj
    zi = Xci[:, 2]
    zj = Xcj[:, 2]
    pred_i = Xci[:, :2] / jnp.where(jnp.abs(Xci[:, 2:3]) < 1e-8, 1e-8, Xci[:, 2:3])
    pred_j = Xcj[:, :2] / jnp.where(jnp.abs(Xcj[:, 2:3]) < 1e-8, 1e-8, Xcj[:, 2:3])
    err_i = jnp.sum((pred_i - uv0n) ** 2, -1)
    err_j = jnp.sum((pred_j - uv1n) ** 2, -1)
    thr = (thr_px * 2.0 / focal) ** 2
    good = (zi > 1e-4) & (zj > 1e-4) & (err_i < thr) & (err_j < thr)
    return X, good


def _pad(a: np.ndarray, n: int, fill=0):
    out = np.full((n, *a.shape[1:]), fill, a.dtype)
    m = min(len(a), n)
    out[:m] = a[:m]
    return out


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class _ShapeLadder:
    """Monotone padded-shape tracker for the BA problems.

    Every distinct compiled shape costs a full XLA compile (~25 s over the
    remote-TPU tunnel, near-independent of the shape — it's the LM/CG
    while-loop graph that's expensive). Measured on the full run this
    dominated global-BA wall-clock at 13 s/call vs ~1 s of actual solving.
    Three rules collapse the ladder to ~one executable per run: PRE-SIZE
    from the known image count (solving a mostly-padding problem costs ~1 s;
    a fresh executable costs ~25 s), grow geometrically when exceeded, and
    keep a high-water mark so shapes never shrink mid-run.

    Growth factor 2 (was 4): LM iteration cost scales with padded O, and
    the solve — not the compile — dominates steady-state wall-clock now
    that the persistent XLA cache carries executables across processes
    (cold pass 695 s -> 65 s); factor 4 averaged ~2.5x padding waste on
    every mid-run BA."""

    def __init__(self, init: Optional[Dict[str, int]] = None, factor: int = 2):
        self.factor = factor
        self.hw: Dict[str, int] = dict(init or {})

    def pad(self, name: str, n: int, minimum: int) -> int:
        b = max(self.hw.get(name, 0), minimum)
        while b < n:
            b *= self.factor
        self.hw[name] = b
        return b


class IncrementalSfM:
    def __init__(
        self,
        n_images: int,
        config: Optional[SfMConfig] = None,
        seed: int = 0,
    ):
        self.cfg = config or SfMConfig()
        self.focal = float(self.cfg.camera.focal_length)
        self.n_images = n_images
        cap = self.cfg.max_tracks
        self.cams = np.zeros((n_images, 6), np.float32)
        self.has_cam = np.zeros(n_images, bool)
        self.points = np.zeros((cap, 3), np.float32)
        self.point_valid = np.zeros(cap, bool)
        self.point_color = np.zeros((cap, 3), np.uint8)
        # Deduplicated (first-wins) observation table keyed by (img, kpt),
        # stored DENSE: slot = img * K + kpt. The previous dict-of-tuples
        # was iterated in full Python on every global BA / error / prune
        # call (~166k entries x dozens of calls on the full dataset).
        K = self.cfg.match_capacity
        self._K = K
        self.obs_valid = np.zeros(n_images * K, np.uint8)
        self.obs_track = np.zeros(n_images * K, np.int64)
        self.obs_uv = np.zeros((n_images * K, 2), np.float32)
        try:
            from tpu3d import native

            self._native = native if native.available() else None
        except Exception:
            self._native = None
        self.key = jax.random.PRNGKey(seed)
        self.num_registered = 0
        self.reg_order: List[int] = []
        self.pair_log: List[dict] = []
        # Cumulative wall-clock per phase (device calls force-sync via the
        # numpy conversions that follow them, so these are true costs).
        self.timers: Dict[str, float] = {
            "pnp": 0.0, "triangulate": 0.0, "local_ba": 0.0,
            "global_ba": 0.0, "windowed_ba": 0.0, "host": 0.0,
        }
        self.counters: Dict[str, int] = {"global_ba": 0, "windowed_ba": 0}
        # Dynamic edge-match capacity: the triangulation inputs are the
        # register step's dominant padded axis (CPU ablation: CAP
        # 2048->512 cut the fused chunk 0.22->0.14 s), and real edges
        # rarely approach the 2048-keypoint bound. pipeline.run_sfm
        # tightens this to a power-of-2 bucket of the actual max edge
        # size before registration starts (set_edge_cap).
        self._edge_cap = EDGE_CAP
        # Pre-size the BA shapes from the dataset: ~128 tracks and ~512
        # observations per camera are generous for 2048-keypoint frames
        # (ystad_kloster lands at ~190/570); the ladder still grows by 4x
        # if a denser scene exceeds them.
        cexp = _bucket(n_images, 8)
        # Pre-size 2x when the BA solves run on an ACCELERATOR: canonical
        # reference selection (r5) raised the full-run track/observation
        # counts ~30% past the old pre-size, and every mid-run ladder
        # growth is a fresh ~25-40 s server-side compile on the tunnel
        # (measured: global_ba 277 s wall for ~73 s of solve at c1's
        # shapes). A one-shape run pays bounded padded-solve cost instead
        # (~0.24 s/LM-iter at the 303k-obs bucket). CPU-backend solves
        # keep the tight ladder: host compiles are cheap and CPU solve
        # time scales with the padded axis.
        import jax as _jax

        from tpu3d.config import resolve_sfm_backend as _rsb

        _mult = 2 if (_jax.default_backend() != "cpu"
                      and _rsb(getattr(self.cfg, "backend", "auto")) != "cpu"
                      ) else 1
        self._gba_shapes = _ShapeLadder(init={
            "C": cexp, "P": max(128 * _mult * cexp, 4096),
            "O": max(512 * _mult * cexp, 16384)})
        self._wba_shapes = _ShapeLadder(init={
            "C": cexp, "P": 16384, "O": 65536} if n_images > 32 else None)

    # ------------------------------------------------------------------
    def _ba_device_ctx(self):
        """BA dispatch placement. SfMConfig.backend == "hybrid" runs the
        registration path on the host CPU (pipeline._sfm_device_ctx wraps
        the whole engine) but lifts the windowed/global BA solves back
        onto the accelerator: the per-step register problems are tunnel-
        RTT-bound, while the Schur-CG LM is real throughput work the TPU
        wins (24-image A/B: global_ba 0.64 s TPU vs 0.89 s CPU; full-run
        BA is ~200 s of LM iterations)."""
        import contextlib

        from tpu3d.config import resolve_sfm_backend

        backend = resolve_sfm_backend(getattr(self.cfg, "backend", "default"))
        if backend == "hybrid":
            devs = jax.devices()
            if devs and devs[0].platform != "cpu":
                return jax.default_device(devs[0])
        return contextlib.nullcontext()

    def presize_global_ba(self, n_obs: int, n_tracks: int) -> None:
        """Pre-size the global-BA padded shapes from EXACT match-graph
        bounds (every (img, kpt) pair in the edges; all unique tracks) —
        known before the first BA compiles. r5 measured the cost of
        guessing: the generic 2x accelerator pre-size (303k obs for 290
        images) was still exceeded by the canonical match graph (~340k),
        the ladder doubled to 606k mid-run, and every later LM iteration
        paid ~1.8x padded compute — global BA 388 s of a 507 s
        reconstruct. Exact bounds + bucket rounding cap the waste at the
        bucket granularity; the ladder still grows if somehow exceeded."""
        BUCKET_O, BUCKET_P = 16384, 4096
        hw = self._gba_shapes.hw
        if n_obs > 0:
            hw["O"] = max(-(-int(n_obs * 1.02) // BUCKET_O) * BUCKET_O,
                          BUCKET_O)
        if n_tracks > 0:
            hw["P"] = max(-(-int(n_tracks * 1.02) // BUCKET_P) * BUCKET_P,
                          BUCKET_P)

    def set_edge_cap(self, max_matches: int) -> None:
        """Bucket the per-edge triangulation capacity to the actual data:
        smallest power of two >= max_matches (floor 256, ceiling EDGE_CAP).
        Must be called before the first registration — changing it mid-run
        would recompile the fused register step."""
        cap = 256
        while cap < min(int(max_matches), EDGE_CAP):
            cap *= 2
        self._edge_cap = min(cap, EDGE_CAP)

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _record_obs(self, img: int, idx: np.ndarray, track: np.ndarray, uv: np.ndarray):
        """First-wins insert into the dense observation table."""
        if len(idx) == 0:
            return
        if self._native is not None:
            self._native.record_obs(
                self.obs_valid, self.obs_track, self.obs_uv, self._K, int(img),
                np.asarray(idx, np.int64), np.asarray(track, np.int64),
                np.asarray(uv, np.float32),
            )
            return
        # numpy fallback: dedup within the batch (keep first), then mask
        # out already-occupied slots.
        idx = np.asarray(idx, np.int64)
        uniq, first = np.unique(idx, return_index=True)
        slots = img * self._K + uniq
        free = self.obs_valid[slots] == 0
        slots = slots[free]
        sel = first[free]
        self.obs_valid[slots] = 1
        self.obs_track[slots] = np.asarray(track, np.int64)[sel]
        self.obs_uv[slots] = np.asarray(uv, np.float32)[sel]

    # ------------------------------------------------------------------
    def register_pair(self, pair: PairObservations) -> dict:
        """Single-edge compatibility wrapper."""
        return self.register_image(pair.to_registration())

    def register_image(self, reg: ImageRegistration) -> dict:
        t_enter = time.time()

        def _dev():
            return (self.timers["pnp"] + self.timers["triangulate"]
                    + self.timers["local_ba"] + self.timers["global_ba"]
                    + self.timers["windowed_ba"])

        dev_before = _dev()
        try:
            return self._register_image(reg)
        finally:
            self.timers["host"] += (time.time() - t_enter) - (_dev() - dev_before)

    def register_batch(self, regs: Sequence[ImageRegistration],
                       batch: int = 8) -> List[dict]:
        """Register a list of images with the fused PnP+triangulation step
        BATCHED over frontier chunks — one device dispatch per `batch`
        images instead of one per image (each dispatch over the remote-TPU
        tunnel costs ~200 ms of round trip; PnP compute is ~10 ms).

        Within a chunk every image is prepared against the PRE-chunk state:
        an image whose anchors would have come from an earlier image in the
        same chunk fails this round and succeeds on the caller's next
        fixpoint round — the same convergence contract the round loop
        already provides for cross-round dependencies."""
        t_enter = time.time()

        def _dev():
            return (self.timers["pnp"] + self.timers["triangulate"]
                    + self.timers["local_ba"] + self.timers["global_ba"]
                    + self.timers["windowed_ba"])

        dev_before = _dev()
        infos: List[dict] = []
        i = 0
        # Bootstrap sequentially until the first pair defines the frame.
        while i < len(regs) and self.num_registered == 0:
            infos.append(self._register_image(regs[i]))
            i += 1
        while i < len(regs):
            chunk = regs[i : i + batch]
            i += len(chunk)
            n0 = self.num_registered
            preps = [self._prepare_register(r) for r in chunk]
            for p in preps:
                p["defer_ba"] = True
            dev = [p for p in preps if p["status"] == "device"]
            outs: Dict[int, tuple] = {}
            if dev:
                # Pad to the static batch size with repeats: one compiled
                # executable serves every chunk (incl. the short tail).
                def stack(ix):
                    arrs = [p["inputs"][ix] for p in dev]
                    arrs += [arrs[-1]] * (batch - len(arrs))
                    return jnp.asarray(np.stack(arrs))

                keys = [np.asarray(p["key"]) for p in dev]
                keys += [keys[-1]] * (batch - len(keys))
                t0 = time.time()
                cam_b, cnt_b, X_b, good_b = _register_step_batch(
                    jnp.asarray(np.stack(keys)), stack(0), stack(1), stack(2),
                    dev[0]["pnp_thr"], stack(3), stack(4), stack(5),
                    self.focal, self.cfg.ransac.threshold_px * 2.0,
                    num_hypotheses=self.cfg.ransac.num_hypotheses // 2,
                )
                cam_b, cnt_b = np.asarray(cam_b), np.asarray(cnt_b)
                X_b, good_b = np.asarray(X_b), np.asarray(good_b)
                self.timers["pnp"] += time.time() - t0
                _tick("pnp_chunk")
                for bi, p in enumerate(dev):
                    outs[id(p)] = (cam_b[bi], int(cnt_b[bi]), X_b[bi], good_b[bi])
            for p in preps:
                infos.append(self._commit_register(p, outs.get(id(p))))
            self._catch_up_triangulation(preps, batch)
            jobs = [p["_ba_job"] for p in preps if "_ba_job" in p]
            if self.cfg.run_pair_ba and jobs:
                self._local_ba_chunk(jobs)
            # BA cadence at chunk granularity: fire when the chunk crossed
            # a global_ba_every boundary (same average frequency as the
            # sequential per-registration check).
            cfg = self.cfg
            if (cfg.run_global_ba and self.num_registered > n0
                    and (self.num_registered // cfg.global_ba_every
                         > n0 // cfg.global_ba_every)):
                if (self.num_registered
                        >= getattr(self, "_last_gba_n", 0) * cfg.global_ba_growth):
                    self.global_ba()
                    self._last_gba_n = self.num_registered
                else:
                    self.windowed_ba(window=cfg.local_window)
        self.timers["host"] += (time.time() - t_enter) - (_dev() - dev_before)
        return infos

    def _catch_up_triangulation(self, preps: List[dict], batch: int) -> None:
        """Triangulate edges the chunk's prepare-time snapshot skipped
        because their reference registered INSIDE the same chunk —
        sequential registration would have caught them; one extra batched
        dispatch per chunk recovers the same points."""
        catch = []
        for p in preps:
            if (p["info"].get("status") != "registered"
                    or p["status"] == "bootstrap"):
                continue
            done = {id(e) for e in p.get("tri_edges", [])}
            for e in p["edges"]:
                if id(e) not in done and self.has_cam[e.ref_img]:
                    catch.append((p["img"], e))
        if not catch:
            return
        E = batch * MAX_REFS  # hard bound: <= batch images x MAX_REFS edges
        ci = np.zeros((E, 6), np.float32)
        cj = np.zeros((E, 6), np.float32)
        CAP = self._edge_cap
        u0 = np.zeros((E, CAP, 2), np.float32)
        u1 = np.zeros((E, CAP, 2), np.float32)
        for k, (jimg, e) in enumerate(catch):
            ci[k] = self.cams[e.ref_img]
            cj[k] = self.cams[jimg]
            u0[k] = _pad(e.uv_ref.astype(np.float32) / self.focal, CAP)
            u1[k] = _pad(e.uv_new.astype(np.float32) / self.focal, CAP)
        t0 = time.time()
        X_c, good_c = _triangulate_and_gate_pairs(
            jnp.asarray(ci), jnp.asarray(cj), jnp.asarray(u0), jnp.asarray(u1),
            self.focal, self.cfg.ransac.threshold_px * 2.0)
        X_c, good_c = np.asarray(X_c), np.asarray(good_c)
        self.timers["triangulate"] += time.time() - t0
        _tick("triangulate")
        for k, (jimg, e) in enumerate(catch):
            self._commit_tri_edge(jimg, e, X_c[k], good_c[k])

    def _register_image(self, reg: ImageRegistration) -> dict:
        prep = self._prepare_register(reg)
        out = None
        if prep["status"] == "device":
            cfg = self.cfg
            Xk, uvk, wk, tri0, tri1, tri2 = prep["inputs"]
            t0 = time.time()
            cam_dev, cnt, X_dev, good_dev = _register_step(
                prep["key"], jnp.asarray(Xk), jnp.asarray(uvk),
                jnp.asarray(wk), prep["pnp_thr"],
                jnp.asarray(tri0), jnp.asarray(tri1), jnp.asarray(tri2),
                self.focal, cfg.ransac.threshold_px * 2.0,
                num_hypotheses=cfg.ransac.num_hypotheses // 2,
            )
            out = (np.asarray(cam_dev), int(cnt),
                   np.asarray(X_dev), np.asarray(good_dev))
            self.timers["pnp"] += time.time() - t0
            _tick("pnp_single")
        return self._commit_register(prep, out)

    def _prepare_register(self, reg: ImageRegistration) -> dict:
        """Host-side read-only half of registration: anchor gathering and
        padded device-input construction against the CURRENT state. The
        tri-edge set is snapshotted here so batched commits stay aligned
        with the fused outputs even when other chunk members register
        their references in between."""
        cfg = self.cfg
        f = self.focal
        j = reg.img
        edges = [e for e in reg.edges if len(e.idx_new) >= 4][:MAX_REFS]
        info = {"img": j, "n_edges": len(edges),
                "edge_sizes": [len(e.idx_new) for e in edges]}
        prep = {"reg": reg, "info": info, "edges": edges, "img": j}

        if self.num_registered == 0:
            e0 = edges[0] if edges else None
            if e0 is None:
                info["status"] = "rejected_no_bootstrap_pose"
                prep["status"] = "reject"
                return prep
            if e0.rel_R is None:
                # Caller didn't attach the relative pose (e.g. synthetic
                # tests) — recover it from the edge's correspondences.
                from tpu3d.geometry.estimators import find_essential_ransac

                m = min(len(e0.idx_new), EDGE_CAP)
                eres = find_essential_ransac(
                    self._next_key(),
                    jnp.asarray(_pad(e0.uv_ref.astype(np.float32), EDGE_CAP)),
                    jnp.asarray(_pad(e0.uv_new.astype(np.float32), EDGE_CAP)),
                    jnp.asarray((np.arange(EDGE_CAP) < m).astype(np.float32)),
                    f, threshold_px=cfg.ransac.threshold_px,
                    num_hypotheses=cfg.ransac.num_hypotheses,
                )
                if int(eres.num_inliers) < 8:
                    info["status"] = "rejected_no_bootstrap_pose"
                    prep["status"] = "reject"
                    return prep
                e0 = dataclasses.replace(
                    e0, rel_R=np.asarray(eres.R), rel_t=np.asarray(eres.t)
                )
            prep["status"] = "bootstrap"
            prep["e0"] = e0
            return prep

        # ---- PnP over the union of known tracks across ALL edges ----
        # Anchors need valid 3D TRACKS, not registered reference
        # cameras: a track triangulated from other views anchors this
        # image even when this edge's reference never registered.
        # (Filtering edges by registered refs here caused huge
        # registration cascades on the full dataset.)
        X_list, uv_list = [], []
        seen_kpts = set()
        for e in edges:
            tr = np.clip(e.track, 0, self.points.shape[0] - 1)
            known = (e.track >= 0) & self.point_valid[tr]
            for m in np.nonzero(known)[0]:
                k = int(e.idx_new[m])
                if k in seen_kpts:
                    continue
                seen_kpts.add(k)
                X_list.append(self.points[tr[m]])
                uv_list.append(e.uv_new[m])
        n_known = len(X_list)
        if n_known < 10 and not any(self.has_cam[e.ref_img] for e in edges):
            info["status"] = "rejected_no_registered_refs"
            info["n_known"] = n_known
            prep["status"] = "reject"
            return prep
        info["n_known"] = n_known
        prep["tri_edges"] = [e for e in edges if self.has_cam[e.ref_img]]
        if n_known < 10:
            prep["status"] = "fallback"
            return prep
        Xk = _pad(np.asarray(X_list, np.float32), PNP_CAP)
        uvk = _pad(np.asarray(uv_list, np.float32) / f, PNP_CAP)
        wk = np.zeros(PNP_CAP, np.float32)
        wk[: min(n_known, PNP_CAP)] = 1.0
        # Triangulation inputs don't depend on the PnP result, so PnP +
        # all-edge triangulation fuse into ONE dispatch. With no registered
        # ref edges the tri inputs are dummies (zero cameras) — the commit
        # ignores the corresponding outputs.
        tri_arrays = self._tri_arrays(prep["tri_edges"], f)
        if tri_arrays is None:
            tri_arrays = (np.zeros((MAX_REFS, 6), np.float32),
                          np.zeros((MAX_REFS, self._edge_cap, 2), np.float32),
                          np.zeros((MAX_REFS, self._edge_cap, 2), np.float32))
        prep["status"] = "device"
        prep["inputs"] = (Xk, uvk, wk, *tri_arrays)
        prep["pnp_thr"] = (2.0 * cfg.ransac.threshold_px / f) ** 2
        prep["key"] = self._next_key()
        return prep

    def _commit_register(self, prep: dict, out=None) -> dict:
        """Host-side write half: camera/point/observation commits, local BA
        and the global/windowed-BA cadence. `out` is the fetched fused-step
        result (cam, inlier count, per-edge X, per-edge gate) or None."""
        cfg = self.cfg
        f = self.focal
        info = prep["info"]
        j = prep["img"]
        edges = prep["edges"]
        if _DUMP_DIR and prep["status"] == "device" and out is not None:
            os.makedirs(_DUMP_DIR, exist_ok=True)
            Xk, uvk, wk, tri0, tri1, tri2 = prep["inputs"]
            np.savez_compressed(
                os.path.join(_DUMP_DIR, f"reg_{next(_dump_seq):05d}.npz"),
                img=j, key=np.asarray(prep["key"]), Xk=Xk, uvk=uvk, wk=wk,
                tri0=tri0, tri1=tri1, tri2=tri2,
                pnp_thr=prep["pnp_thr"], focal=self.focal,
                tri_thr_px=cfg.ransac.threshold_px * 2.0,
                nhyp=cfg.ransac.num_hypotheses // 2,
                cam=np.asarray(out[0]), cnt=int(out[1]),
                good_per_edge=np.asarray(out[3]).sum(axis=-1))
        if prep["status"] == "reject":
            return info
        fused = None
        if prep["status"] == "bootstrap":
            e0 = prep["e0"]
            self.cams[e0.ref_img] = 0.0
            self.has_cam[e0.ref_img] = True
            cam_j = np.concatenate([lie.so3_log_np(e0.rel_R), e0.rel_t]).astype(np.float32)
            self.num_registered += 1
            self.reg_order.append(e0.ref_img)
            edges = [e0]
            tri_snapshot = [e0]
        else:
            tri_snapshot = prep["tri_edges"]
            cam_j = None
            if prep["status"] == "device" and out is not None:
                cam_dev, pnp_cnt, X_dev, good_dev = out
                info["n_pnp_inliers"] = pnp_cnt
                if pnp_cnt > cfg.min_pnp_inliers:
                    cam_j = np.asarray(cam_dev)
                    if tri_snapshot:
                        fused = (X_dev, good_dev)
            if cam_j is None:
                # ---- relative-pose fallback (breaks registration cascades) ----
                # PnP failed or too few anchors: take the matching stage's
                # essential-matrix pose w.r.t. a REGISTERED reference and
                # resolve the scale from whatever shared triangulated
                # points exist. A chain break at one weak image otherwise
                # unregisters everything behind it.
                cam_j = self._relative_pose_fallback(j, edges, info)
                if cam_j is None:
                    info["status"] = info.get("status", "rejected_pnp")
                    return info

        # ---- write camera ----
        self.cams[j] = cam_j
        if not self.has_cam[j]:
            self.has_cam[j] = True
            self.num_registered += 1
            self.reg_order.append(j)

        # ---- triangulate new tracks, ALL edges in one device call ----
        n_new_total = 0
        ba_edges = []
        tri_edges = []
        tri_ids = {id(e) for e in tri_snapshot}
        for e in edges:
            if id(e) not in tri_ids:
                # Ref not registered (at prepare time): still record this
                # image's own observations of already-valid tracks — the
                # global-problem gather filters by has_cam, so they
                # activate when/if the ref registers.
                tr2 = np.clip(e.track, 0, self.points.shape[0] - 1)
                live = (e.track >= 0) & self.point_valid[tr2]
                if live.any():
                    self._record_obs(j, e.idx_new[live], e.track[live], e.uv_new[live])
                    self._record_obs(e.ref_img, e.idx_ref[live], e.track[live], e.uv_ref[live])
                continue
            tri_edges.append(e)
        if tri_edges and fused is not None:
            X_all, good_all = fused
        elif tri_edges:
            cams_i, uv_r, uv_n = self._tri_arrays(tri_edges, f)
            t0 = time.time()
            X_all, good_all = _triangulate_and_gate_edges(
                jnp.asarray(cams_i), jnp.asarray(cam_j),
                jnp.asarray(uv_r), jnp.asarray(uv_n), f,
                cfg.ransac.threshold_px * 2.0,
            )
            X_all = np.asarray(X_all)
            good_all = np.asarray(good_all)
            self.timers["triangulate"] += time.time() - t0
            _tick("triangulate")
        for k, e in enumerate(tri_edges):
            accept, n_new = self._commit_tri_edge(j, e, X_all[k], good_all[k])
            n_new_total += n_new
            ba_edges.append((e, accept))

        info.update(status="registered", n_new_points=n_new_total)
        if prep.get("defer_ba"):
            # Batched path: local BA and the BA cadence run once per chunk
            # (register_batch), not per image.
            prep["_ba_job"] = (j, ba_edges)
            self.pair_log.append(info)
            return info

        # ---- local BA: camera j + its new points, residuals on all edges ----
        if cfg.run_pair_ba:
            t0 = time.time()
            self._local_ba(j, ba_edges)
            self.timers["local_ba"] += time.time() - t0

        if cfg.run_global_ba and self.num_registered % cfg.global_ba_every == 0:
            if (self.num_registered
                    >= getattr(self, "_last_gba_n", 0) * cfg.global_ba_growth):
                self.global_ba()
                self._last_gba_n = self.num_registered
                info["global_ba"] = True
            else:
                # growth-gated: a cheap O(window) refinement keeps the
                # chain frontier tight instead of re-solving the full
                # problem (measured: every-8 full BA buys ~14 extra
                # registrations over growth-only at 3.6x the wall-clock;
                # the window recovers that at O(window) cost)
                self.windowed_ba(window=cfg.local_window)
                info["windowed_ba"] = True
        self.pair_log.append(info)
        return info

    def _commit_tri_edge(self, j: int, e, X_row: np.ndarray, good_row: np.ndarray):
        """Accept newly triangulated tracks on edge (e.ref_img, j) and
        record observations for every live match (first-wins insert makes
        re-recording idempotent)."""
        tr = np.clip(e.track, 0, self.points.shape[0] - 1)
        new = (e.track >= 0) & ~self.point_valid[tr]
        m = min(len(e.idx_new), self._edge_cap)
        accept = np.zeros(len(e.idx_new), bool)
        accept[:m] = good_row[:m] & new[:m]
        n_new = int(accept.sum())
        if n_new:
            ids = e.track[accept]
            self.points[ids] = X_row[:m][accept[:m]]
            self.point_valid[ids] = True
            self.point_color[ids] = e.colors_ref[accept]
        tr2 = np.clip(e.track, 0, self.points.shape[0] - 1)
        live = (e.track >= 0) & self.point_valid[tr2]
        if live.any():
            self._record_obs(e.ref_img, e.idx_ref[live], e.track[live], e.uv_ref[live])
            self._record_obs(j, e.idx_new[live], e.track[live], e.uv_new[live])
        return accept, n_new

    # ------------------------------------------------------------------
    def _tri_arrays(self, tri_edges, f):
        """Padded (MAX_REFS, ...) device inputs for the batched per-edge
        triangulation: (cams_i (E,6), uv_ref, uv_new (E,EDGE_CAP,2))."""
        if not tri_edges:
            return None
        cams_i = np.stack([self.cams[e.ref_img] for e in tri_edges])
        uv_r = np.stack([_pad(e.uv_ref.astype(np.float32) / f, self._edge_cap) for e in tri_edges])
        uv_n = np.stack([_pad(e.uv_new.astype(np.float32) / f, self._edge_cap) for e in tri_edges])
        # Pad the edge axis so the batched kernel compiles once.
        ne = len(tri_edges)
        if ne < MAX_REFS:
            cams_i = np.concatenate([cams_i, np.tile(cams_i[-1:], (MAX_REFS - ne, 1))])
            uv_r = np.concatenate([uv_r, np.tile(uv_r[-1:], (MAX_REFS - ne, 1, 1))])
            uv_n = np.concatenate([uv_n, np.tile(uv_n[-1:], (MAX_REFS - ne, 1, 1))])
        return cams_i, uv_r, uv_n

    # ------------------------------------------------------------------
    def _relative_pose_fallback(self, j: int, edges, info: dict,
                                relaxed: bool = False):
        """world->j from a registered ref's camera + the edge's relative
        pose (from E), with translation scale from shared valid tracks.

        x_newcam = rel_R x_refcam + s*rel_t  ⇒  R_j = rel_R R_r,
        t_j = rel_R t_r + s rel_t. Scale s = median z-ratio between the
        known world points (in ref-cam frame) and the unit-baseline
        two-view triangulation of the same correspondences.

        Pure numpy on purpose: the per-edge point counts vary, and a jnp
        implementation would recompile for every distinct shape."""

        def midpoint_np(Rrel, trel, xr, xn):
            d0 = np.concatenate([xr, np.ones((len(xr), 1), np.float32)], -1)
            d1 = np.concatenate([xn, np.ones((len(xn), 1), np.float32)], -1)
            d1 = d1 @ Rrel  # rotate new-cam dirs into ref frame (Rᵀ·d)
            d0 = d0 / np.linalg.norm(d0, axis=-1, keepdims=True)
            d1 = d1 / np.linalg.norm(d1, axis=-1, keepdims=True)
            c1 = -Rrel.T @ trel
            b = c1[None, :]
            d01 = np.sum(d0 * d1, -1)
            denom = np.maximum(1.0 - d01**2, 1e-9)
            bd0 = d0 @ c1
            bd1 = d1 @ c1
            s0 = (bd0 - d01 * bd1) / denom
            s1 = (d01 * bd0 - bd1) / denom
            p0 = s0[:, None] * d0
            p1 = b + s1[:, None] * d1
            return 0.5 * (p0 + p1)

        f = self.focal
        best = None
        for e in edges:
            if e.rel_R is None or not self.has_cam[e.ref_img]:
                continue
            tr = np.clip(e.track, 0, self.points.shape[0] - 1)
            known = (e.track >= 0) & self.point_valid[tr]
            if known.sum() < 3:
                continue
            R_r = lie.so3_exp_np(self.cams[e.ref_img, :3])
            t_r = self.cams[e.ref_img, 3:6]
            Xw = self.points[tr[known]]
            X_ref = Xw @ R_r.T + t_r                      # ref-cam frame
            # Self-consistency prefilter: only anchors whose world point
            # reprojects onto its OWN observation in the (registered)
            # reference camera may vote on the scale. Drift-polluted track
            # regions (measured: img 180 with 272 anchors, only 29% within
            # 2 px in their own ref view) otherwise scatter the z-ratios
            # and fail the MAD gate even when the edge itself is perfect
            # (630/631 E-inliers).
            zr = X_ref[:, 2]
            pred_r = f * X_ref[:, :2] / np.where(np.abs(zr[:, None]) < 1e-9, 1e-9, zr[:, None])
            err_r = np.linalg.norm(pred_r - e.uv_ref[known], axis=1)
            consistent = (zr > 1e-4) & (err_r < 6.0 * self.cfg.ransac.threshold_px)
            if consistent.sum() >= 6:
                known_idx = np.nonzero(known)[0][consistent]
                known = np.zeros_like(known)
                known[known_idx] = True
                Xw = self.points[tr[known]]
                X_ref = Xw @ R_r.T + t_r
            # unit-baseline triangulation in the ref-cam frame
            uv_r = e.uv_ref[known].astype(np.float32) / f
            uv_n = e.uv_new[known].astype(np.float32) / f
            X_rel = midpoint_np(e.rel_R.astype(np.float32), e.rel_t.astype(np.float32), uv_r, uv_n)
            z_ratio = X_ref[:, 2] / np.where(np.abs(X_rel[:, 2]) < 1e-9, 1e-9, X_rel[:, 2])
            z_ratio = z_ratio[(z_ratio > 1e-6) & np.isfinite(z_ratio)]
            if len(z_ratio) < 6:
                continue
            s = float(np.median(z_ratio))
            # Scale-consistency gate: a wrongly-scaled placement creates an
            # internally-consistent but globally-teleported camera island
            # (observed on the full dataset). Demand that the depth ratios
            # actually agree on one scale.
            mad = float(np.median(np.abs(z_ratio - s))) / max(abs(s), 1e-9)
            if mad > 0.25 and not relaxed:
                continue
            R_j = e.rel_R @ R_r
            t_j = e.rel_R @ t_r + s * e.rel_t
            # sanity gate: reproject the known points into the new camera
            Xc = Xw @ R_j.T + t_j
            ok_z = Xc[:, 2] > 1e-4
            pred = f * Xc[:, :2] / np.where(np.abs(Xc[:, 2:3]) < 1e-9, 1e-9, Xc[:, 2:3])
            err = np.linalg.norm(pred - e.uv_new[known], axis=1)
            good = int(np.sum(ok_z & (err < 8.0 * self.cfg.ransac.threshold_px)))
            if best is None or good > best[0]:
                best = (good, R_j, t_j, len(err))
        # Majority of the anchors must agree with the placement, not just a
        # handful. Relaxed mode (the --register-all low-confidence pass)
        # takes the best candidate regardless — the caller marks the camera
        # and keeps it out of the gauge.
        if relaxed:
            if best is None:
                # Last resort: chain the first available relative pose at
                # scale 1 (the reference's effective behavior when its
                # per-pair scale is meaningless).
                for e in edges:
                    if e.rel_R is None or not self.has_cam[e.ref_img]:
                        continue
                    R_r = lie.so3_exp_np(self.cams[e.ref_img, :3])
                    t_r = self.cams[e.ref_img, 3:6]
                    R_j = e.rel_R @ R_r
                    t_j = e.rel_R @ t_r + e.rel_t
                    info["fallback_relpose_inliers"] = "chained_s1"
                    return np.concatenate(
                        [lie.so3_log_np(R_j), t_j]).astype(np.float32)
                return None
            info["fallback_relpose_inliers"] = f"{best[0]}/{best[3]} (relaxed)"
            return np.concatenate(
                [lie.so3_log_np(best[1]), best[2]]).astype(np.float32)
        if best is None or best[0] < 6 or best[0] < 0.5 * best[3]:
            return None
        info["fallback_relpose_inliers"] = f"{best[0]}/{best[3]}"
        return np.concatenate([lie.so3_log_np(best[1]), best[2]]).astype(np.float32)

    # ------------------------------------------------------------------
    def _local_ba_prepare(self, j: int, ba_edges):
        """Fixed-shape local-BA problem for camera j (None if too small)."""
        f = self.focal
        # Collect the point set: live tracks observed on these edges.
        track_slot: Dict[int, int] = {}
        pts = []
        pt_new = []
        obs = []  # (cam_slot, pt_slot, u, v)
        cams_list = [self.cams[j]]
        cam_slot = {j: 0}
        for e, accept in ba_edges:
            if e.ref_img not in cam_slot:
                cam_slot[e.ref_img] = len(cams_list)
                cams_list.append(self.cams[e.ref_img])
            cs = cam_slot[e.ref_img]
            tr = np.clip(e.track, 0, self.points.shape[0] - 1)
            live = (e.track >= 0) & self.point_valid[tr]
            for m in np.nonzero(live)[0]:
                t = int(e.track[m])
                if t not in track_slot:
                    if len(pts) >= BA_CAP_P:
                        continue
                    track_slot[t] = len(pts)
                    pts.append(self.points[t])
                    pt_new.append(bool(accept[m]))
                ps = track_slot[t]
                if len(obs) < BA_CAP_O - 1:
                    obs.append((0, ps, e.uv_new[m, 0] / f, e.uv_new[m, 1] / f))
                    obs.append((cs, ps, e.uv_ref[m, 0] / f, e.uv_ref[m, 1] / f))
        if len(obs) < 16 or not pts:
            return None
        C = MAX_REFS + 1
        cams0 = np.zeros((C, 6), np.float32)
        cams0[: len(cams_list)] = np.stack(cams_list)
        cam_fixed = np.ones(C, np.float32)
        cam_fixed[0] = 0.0  # only camera j moves
        P = BA_CAP_P
        pts_arr = _pad(np.asarray(pts, np.float32), P)
        pt_fixed = np.ones(P, np.float32)
        pt_fixed[: len(pts)] = (~np.asarray(pt_new)).astype(np.float32)
        O = BA_CAP_O
        obs_arr = np.zeros((O, 4), np.float32)
        obs_arr[: len(obs)] = np.asarray(obs, np.float32)
        w = np.zeros(O, np.float32)
        w[: len(obs)] = 1.0
        arrays = (cams0, pts_arr, obs_arr[:, 0].astype(np.int32),
                  obs_arr[:, 1].astype(np.int32),
                  np.ascontiguousarray(obs_arr[:, 2:4]), w, cam_fixed, pt_fixed)
        return arrays, track_slot, pt_new

    def _local_ba_commit(self, j: int, cams_out, pts_out, track_slot, pt_new):
        self.cams[j] = np.asarray(cams_out)[0]
        new_pts = np.asarray(pts_out)
        for t, s in track_slot.items():
            if pt_new[s]:
                self.points[t] = new_pts[s]

    def _local_ba(self, j: int, ba_edges) -> None:
        """Refine camera j + the points just triangulated, with residuals in
        camera j AND every (frozen) reference camera."""
        prep = self._local_ba_prepare(j, ba_edges)
        if prep is None:
            return
        arrays, track_slot, pt_new = prep
        st = bundle_adjust(
            *(jnp.asarray(a) for a in arrays),
            max_iters=self.cfg.ba.max_iters // 2, cg_iters=8,
        )
        self._local_ba_commit(j, st.cams, st.points, track_slot, pt_new)

    def _local_ba_chunk(self, jobs) -> None:
        """All of a registration chunk's local BAs in ONE vmapped dispatch
        (each is a fixed-shape (MAX_REFS+1, BA_CAP_P, BA_CAP_O) problem —
        sequentially they cost one ~100 ms tunnel round trip apiece)."""
        preps = []
        for j, ba_edges in jobs:
            p = self._local_ba_prepare(j, ba_edges)
            if p is not None:
                preps.append((j, p))
        if not preps:
            return
        t0 = time.time()
        # Pad to the registration chunk size with repeats so one executable
        # serves every chunk (incl. the short tail).
        B = max(len(preps), int(self.cfg.register_batch))
        rows = list(range(len(preps))) + [len(preps) - 1] * (B - len(preps))
        stacked = [np.stack([preps[r][1][0][ix] for r in rows])
                   for ix in range(8)]
        cams_b, pts_b = _local_ba_batch(
            *(jnp.asarray(a) for a in stacked),
            max_iters=self.cfg.ba.max_iters // 2, cg_iters=8,
        )
        cams_b, pts_b = np.asarray(cams_b), np.asarray(pts_b)
        self.timers["local_ba"] += time.time() - t0
        _tick("local_ba")
        for bi, (j, (_, track_slot, pt_new)) in enumerate(preps):
            self._local_ba_commit(j, cams_b[bi], pts_b[bi], track_slot, pt_new)

    # ------------------------------------------------------------------
    def _gather_global_problem(self):
        """Vectorized over the dense obs table. `keys` are flat slot ids
        (pop an observation by zeroing obs_valid[slot])."""
        slots = np.flatnonzero(self.obs_valid)
        if len(slots) == 0:
            return None
        img_ids = (slots // self._K).astype(np.int32)
        tracks = self.obs_track[slots]
        uv = self.obs_uv[slots] / self.focal
        live = self.point_valid[np.clip(tracks, 0, len(self.point_valid) - 1)] & self.has_cam[img_ids]
        slots, img_ids, tracks, uv = slots[live], img_ids[live], tracks[live], uv[live]
        if len(img_ids) == 0:
            return None
        cam_slots = np.flatnonzero(self.has_cam)
        cam_map = np.full(self.n_images, -1, np.int32)
        cam_map[cam_slots] = np.arange(len(cam_slots), dtype=np.int32)
        cam_idx = cam_map[img_ids]
        uniq_tracks, pt_idx = np.unique(tracks, return_inverse=True)
        pt_idx = pt_idx.astype(np.int32)
        # Sort observations by point id: segment sums / gathers on the
        # point axis get contiguous segments (indices_are_sorted hint in
        # ba/lm.py), and scatter locality improves either way.
        order = np.argsort(pt_idx, kind="stable")
        return (cam_slots, cam_idx[order], uniq_tracks, pt_idx[order],
                uv[order], slots[order])

    def windowed_ba(self, window: int = 25, max_iters: Optional[int] = None):
        """COLMAP-style local refinement: optimize the most recently
        registered `window` cameras and the tracks they observe, with all
        other observers frozen as anchors. O(window), not O(n) — this is
        what keeps chain-local geometry tight between (growth-gated) full
        global BAs without re-solving the whole problem every 8 images."""
        t0 = time.time()
        self.counters["windowed_ba"] += 1
        try:
            with self._ba_device_ctx():
                return self._windowed_ba(window, max_iters)
        finally:
            self.timers["windowed_ba"] += time.time() - t0

    def _windowed_ba(self, window: int, max_iters: Optional[int]):
        recent = [i for i in self.reg_order if self.has_cam[i]][-window:]
        if len(recent) < 2:
            return
        recent_set = np.zeros(self.n_images, bool)
        recent_set[recent] = True
        prob = self._gather_global_problem()
        if prob is None:
            return
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv, _keys = prob
        # tracks observed by any window camera
        win_obs = recent_set[cam_slots[cam_idx]]
        win_tracks = np.zeros(len(uniq_tracks), bool)
        win_tracks[pt_idx[win_obs]] = True
        # keep every observation OF those tracks (frozen cams anchor them)
        keep = win_tracks[pt_idx]
        cam_idx, pt_idx, uv = cam_idx[keep], pt_idx[keep], uv[keep]
        used_cams = np.unique(cam_idx)
        cmap = np.full(len(cam_slots), -1, np.int32)
        cmap[used_cams] = np.arange(len(used_cams), dtype=np.int32)
        cam_idx = cmap[cam_idx]
        used_tracks = np.unique(pt_idx)
        pmap = np.full(len(uniq_tracks), -1, np.int32)
        pmap[used_tracks] = np.arange(len(used_tracks), dtype=np.int32)
        pt_idx = pmap[pt_idx]
        C = self._wba_shapes.pad("C", len(used_cams), 8)
        P = self._wba_shapes.pad("P", len(used_tracks), 4096)
        O = self._wba_shapes.pad("O", len(cam_idx), 16384)
        cams0 = np.zeros((C, 6), np.float32)
        cams0[: len(used_cams)] = self.cams[cam_slots[used_cams]]
        cam_fixed = np.ones(C, np.float32)
        cam_fixed[: len(used_cams)] = (~recent_set[cam_slots[used_cams]]).astype(np.float32)
        if cam_fixed[: len(used_cams)].min() == 1.0:
            return
        # gauge: freeze the oldest moving camera if nothing else anchors
        if cam_fixed[: len(used_cams)].max() == 0.0:
            cam_fixed[0] = 1.0
        pts = np.zeros((P, 3), np.float32)
        pts[: len(used_tracks)] = self.points[uniq_tracks[used_tracks]]
        pt_fixed = np.zeros(P, np.float32)
        pt_fixed[len(used_tracks):] = 1.0
        w = np.zeros(O, np.float32)
        w[: len(cam_idx)] = 1.0
        ci = np.zeros(O, np.int32)
        ci[: len(cam_idx)] = cam_idx
        pi = np.full(O, P - 1, np.int32)  # sorted invariant (see _global_ba)
        pi[: len(cam_idx)] = pt_idx
        uvp = np.zeros((O, 2), np.float32)
        uvp[: len(cam_idx)] = uv
        rb = self.cfg.ba.robust_huber_px
        # Same statics as global BA (compile-count discipline: the LM early
        # exit makes the larger caps cost only what the problem needs).
        st = bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(pts), jnp.asarray(ci), jnp.asarray(pi),
            jnp.asarray(uvp), jnp.asarray(w), jnp.asarray(cam_fixed), jnp.asarray(pt_fixed),
            max_iters=max_iters or self.cfg.ba.mid_max_iters,
            cg_iters=self.cfg.ba.mid_cg_iters,
            robust_delta=(rb / self.focal) if rb else None,
            stall_tol=1e-4,
            pt_sorted=True,
        )
        new_cams = np.asarray(st.cams)
        moving = cam_fixed[: len(used_cams)] == 0.0
        self.cams[cam_slots[used_cams[moving]]] = new_cams[: len(used_cams)][moving]
        self.points[uniq_tracks[used_tracks]] = np.asarray(st.points)[: len(used_tracks)]

    def global_ba(self, max_iters: Optional[int] = None, prune: bool = True,
                  final: bool = False):
        """Global BA with one round of residual-based observation pruning
        (the reference has neither; its heavy outlier tail — BASELINE.md
        median 0.31px vs mean 4.56px — is exactly what this removes).
        Mid-run solves use a loose LM stall tolerance (they get refined
        again anyway); `final=True` runs to the tight tolerance."""
        t0 = time.time()
        self.counters["global_ba"] += 1
        try:
            with self._ba_device_ctx():
                return self._global_ba(max_iters, prune, final)
        finally:
            self.timers["global_ba"] += time.time() - t0

    def _global_ba(self, max_iters: Optional[int] = None, prune: bool = True,
                   final: bool = False):
        prob = self._gather_global_problem()
        if prob is None:
            return
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv, keys = prob
        C_real = len(cam_slots)
        # Bucket the camera count too: growth-gated global BAs otherwise
        # hit a fresh C at nearly every call and recompile the whole Schur
        # graph (~37 distinct executables over a 290-image run; the TPU
        # tunnel charges tens of seconds per compile). Padded cameras are
        # frozen via cam_fixed.
        C = self._gba_shapes.pad("C", C_real, 8)
        P_real = len(uniq_tracks)
        O_real = len(cam_idx)
        P = self._gba_shapes.pad("P", P_real, 4096)
        O = self._gba_shapes.pad("O", O_real, 16384)
        cams0 = np.zeros((C, 6), np.float32)
        cams0[:C_real] = self.cams[cam_slots]
        pts = np.zeros((P, 3), np.float32)
        pts[:P_real] = self.points[uniq_tracks]
        w = np.zeros(O, np.float32)
        w[:O_real] = 1.0
        ci = np.zeros(O, np.int32)
        ci[:O_real] = cam_idx
        # Pad point ids with P-1 (not 0): observations arrive sorted by
        # point and the solver passes indices_are_sorted — a zero after the
        # sorted ids would break the nondecreasing invariant.
        pi = np.full(O, P - 1, np.int32)
        pi[:O_real] = pt_idx
        uvp = np.zeros((O, 2), np.float32)
        uvp[:O_real] = uv
        cam_fixed = np.ones(C, np.float32)
        cam_fixed[1:C_real] = 0.0
        pt_fixed = np.zeros(P, np.float32)
        pt_fixed[P_real:] = 1.0
        rb = self.cfg.ba.robust_huber_px
        robust = (rb / self.focal) if rb else None
        # Upload the observation arrays ONCE and reuse the device buffers
        # across the main solve, the residual pass and the prune refit —
        # the ~5.5 MB problem costs seconds per transfer over the tunnel
        # and three jnp.asarray calls paid it three times.
        t_up = time.time()
        ci_d, pi_d, uv_d = jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uvp)
        w_d, cf_d = jnp.asarray(w), jnp.asarray(cam_fixed)
        mi = max_iters or (self.cfg.ba.max_iters if final
                           else self.cfg.ba.mid_max_iters)
        cgi = 32 if final else self.cfg.ba.mid_cg_iters
        st = bundle_adjust(
            jnp.asarray(cams0), jnp.asarray(pts), ci_d, pi_d,
            uv_d, w_d, cf_d, jnp.asarray(pt_fixed),
            max_iters=mi, cg_iters=cgi,
            robust_delta=robust,
            stall_tol=1e-5 if final else 1e-4,
            pt_sorted=True,
        )
        # Sub-phase timers (async dispatch: "dispatch" is upload+enqueue,
        # "mask_fetch" blocks on the main solve, "commit" blocks on the
        # refit + the final state download).
        self.timers["gba_dispatch"] = self.timers.get("gba_dispatch", 0.0) + (
            time.time() - t_up)
        t_pr = time.time()
        if prune:
            # Outlier mask computed ON DEVICE; only the (O,) uint8 mask
            # crosses the tunnel (the full (O, 2) f32 residual download was
            # a visible fraction of global-BA wall-clock at ~MB/s link
            # bandwidth).
            thr_px = 3.0 * self.cfg.ransac.threshold_px
            bad = np.asarray(_prune_mask(
                st.cams, st.points, ci_d, pi_d, uv_d, w_d,
                self.focal, thr_px)).astype(bool)
            self.timers["gba_mask_fetch"] = self.timers.get(
                "gba_mask_fetch", 0.0) + (time.time() - t_pr)
            _tick("gba_mask_fetch")
            self.counters["gba_lm_iters_main"] = self.counters.get(
                "gba_lm_iters_main", 0) + int(st.n_iters)
            t_pr = time.time()
            if bad.any():
                self.obs_valid[keys[np.nonzero(bad[:O_real])[0]]] = 0
                w[bad] = 0.0
                # Tracks left with <2 observations lose their 3D point.
                live_counts = np.bincount(pi[:O_real][w[:O_real] > 0], minlength=P)
                dead = np.nonzero(live_counts[:P_real] < 2)[0]
                if len(dead):
                    self.point_valid[uniq_tracks[dead]] = False
                    pt_fixed[dead] = 1.0
            # Env-gated experiment (TPU3D_REFIT_MIN_FRAC, e.g. "0.002"):
            # skip the mid-run refit when the prune removed fewer than
            # that fraction of observations — late-run prunes are tiny
            # and the next growth-gated BA re-solves anyway. Default off
            # pending a full-dataset decision A/B.
            _min_frac = float(os.environ.get("TPU3D_REFIT_MIN_FRAC", "0"))
            _tiny = (not final and _min_frac > 0
                     and bad.sum() < _min_frac * max(O_real, 1))
            if bad.any() and not _tiny and (
                    final or getattr(self.cfg.ba, "midrun_refit", True)):
                # Same statics (max_iters/cg_iters/robust) as the main solve
                # so the refit reuses its executable — a second variant per
                # shape would double the compile bill that dominates
                # global-BA wall-clock on the tunnel. Huber ≈ L2 on the
                # pruned inlier set; the LM early exit bounds the extra
                # iterations. Only the changed arrays (w, pt_fixed) re-upload.
                st = bundle_adjust(
                    st.cams, st.points, ci_d, pi_d,
                    uv_d, jnp.asarray(w),
                    cf_d, jnp.asarray(pt_fixed),
                    max_iters=mi, cg_iters=cgi,
                    robust_delta=robust,
                    stall_tol=1e-5 if final else 1e-4,
                    pt_sorted=True,
                )
        cams_h, pts_h, n_it = jax.device_get((st.cams, st.points, st.n_iters))
        self.cams[cam_slots] = cams_h[:C_real]
        keep = self.point_valid[uniq_tracks]
        self.points[uniq_tracks[keep]] = pts_h[:P_real][keep]
        self.counters["gba_lm_iters"] = self.counters.get(
            "gba_lm_iters", 0) + int(n_it)
        self.timers["gba_commit"] = self.timers.get("gba_commit", 0.0) + (
            time.time() - t_pr)
        _tick("gba_commit")

    # ------------------------------------------------------------------
    def _padded_residuals(self, cam_slots, cam_idx, uniq_tracks, pt_idx, uv):
        """Reprojection residuals on ladder-padded shapes (jit'd graphs per
        exact size would each pay a tunnel compile)."""
        O_real = len(cam_idx)
        C = self._gba_shapes.pad("C", len(cam_slots), 8)
        P = self._gba_shapes.pad("P", len(uniq_tracks), 4096)
        O = self._gba_shapes.pad("O", O_real, 16384)
        cams = np.zeros((C, 6), np.float32)
        cams[: len(cam_slots)] = self.cams[cam_slots]
        pts = np.zeros((P, 3), np.float32)
        pts[: len(uniq_tracks)] = self.points[uniq_tracks]
        ci = np.zeros(O, np.int32)
        ci[:O_real] = cam_idx
        pi = np.zeros(O, np.int32)
        pi[:O_real] = pt_idx
        uvp = np.zeros((O, 2), np.float32)
        uvp[:O_real] = uv
        w = np.zeros(O, np.float32)
        w[:O_real] = 1.0
        r = reprojection_residuals(
            jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci),
            jnp.asarray(pi), jnp.asarray(uvp), jnp.asarray(w))
        return np.asarray(r)[:O_real]

    def mean_reprojection_error(self) -> Tuple[float, int]:
        prob = self._gather_global_problem()
        if prob is None:
            return float("nan"), 0
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv, _keys = prob
        r = self._padded_residuals(cam_slots, cam_idx, uniq_tracks, pt_idx, uv)
        err = np.linalg.norm(r, axis=-1) * self.focal
        return float(err.mean()), len(err)

    def per_camera_reproj(self) -> Dict[int, float]:
        """Mean reprojection error (px) per registered image — an
        objective camera-trust signal the DENSE stage can consume: a
        camera whose sparse pose is drift-polluted shows it here, and
        using it as a dense train/eval view measures pose error, not
        reconstruction quality (ROUND3_NOTES provenance sensitivity)."""
        prob = self._gather_global_problem()
        if prob is None:
            return {}
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv, _keys = prob
        r = self._padded_residuals(cam_slots, cam_idx, uniq_tracks, pt_idx, uv)
        err = np.linalg.norm(r, axis=-1) * self.focal
        sums = np.bincount(cam_idx, weights=err[: len(cam_idx)],
                           minlength=len(cam_slots))
        cnts = np.maximum(np.bincount(cam_idx, minlength=len(cam_slots)), 1)
        return {int(img): float(s / c)
                for img, s, c in zip(cam_slots, sums, cnts)}

    def _snapshot_state(self) -> dict:
        """Copy of the mutable reconstruction state (cameras, points,
        observation validity) — a few MB; used by finalize's gate loop."""
        return {
            "cams": self.cams.copy(), "has_cam": self.has_cam.copy(),
            "points": self.points.copy(),
            "point_valid": self.point_valid.copy(),
            "obs_valid": self.obs_valid.copy(),
            "num_registered": self.num_registered,
        }

    def _restore_state(self, snap: dict) -> None:
        self.cams[:] = snap["cams"]
        self.has_cam[:] = snap["has_cam"]
        self.points[:] = snap["points"]
        self.point_valid[:] = snap["point_valid"]
        self.obs_valid[:] = snap["obs_valid"]
        self.num_registered = snap["num_registered"]

    def deregister_weak_cameras(self, min_obs: int = 8, max_median_px: float = 8.0,
                                lenient: Optional[set] = None):
        """Drop cameras whose surviving observation support is too thin or
        too inconsistent. A camera placed at a wrong scale (fallback gone
        bad) ends up with its anchor observations pruned — internally
        consistent but teleported relative to the main component. Better to
        report it unregistered than to ship a wrong pose.

        lenient: image ids judged at a RELAXED gate (min_obs//2, 1.5x
        max_median_px) — finalize's re-registered cameras, so a camera
        sitting at the threshold doesn't oscillate across the gate as each
        BA nudges the optimum (hysteresis; the observed failure mode was
        "re-register 7 -> drop 14, ending WORSE than one pass").
        Returns the list of dropped image ids (empty list = none)."""
        prob = self._gather_global_problem()
        if prob is None:
            return []
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv, keys = prob
        r = self._padded_residuals(cam_slots, cam_idx, uniq_tracks, pt_idx, uv)
        err = np.linalg.norm(r, axis=-1) * self.focal
        dropped = []
        for ci, img in enumerate(cam_slots):
            sel = cam_idx == ci
            n = int(sel.sum())
            lo, hi = min_obs, max_median_px
            if lenient and int(img) in lenient:
                lo, hi = max(2, min_obs // 2), 1.5 * max_median_px
            if n < lo or (n and float(np.median(err[sel])) > hi):
                self.has_cam[img] = False
                self.num_registered -= 1
                dropped.append(int(img))
                self.obs_valid[keys[np.nonzero(sel)[0]]] = 0
        if dropped:
            # Tracks that lost support down to <2 observations die with them.
            slots = np.flatnonzero(self.obs_valid)
            counts = np.bincount(self.obs_track[slots], minlength=len(self.point_valid))
            self.point_valid &= counts[: len(self.point_valid)] >= 2
        return dropped

    def finalize(self, image_names: Sequence[str],
                 registrations: Optional[Sequence[ImageRegistration]] = None,
                 verbose: bool = False) -> Reconstruction:
        if self.cfg.run_global_ba:
            self.global_ba(final=True)
            dropped = self.deregister_weak_cameras()
            if dropped and verbose:
                print(f"[sfm] finalize dropped weak cameras: {dropped}",
                      flush=True)
            if dropped:
                # Drop -> mid-budget BA -> fresh registration attempt ->
                # re-gate, iterated to its (small) fixpoint: a camera
                # dropped for thin support often re-registers cleanly once
                # the BA has absorbed the pruning (measured: 14 finalize
                # drops on the full dataset, all recovered -> 290/290; a
                # single round left 4 behind on the TPU backend). Exactly
                # one final full-budget polish ships at the end.
                if registrations is not None:
                    by_img = {r.img: r for r in registrations}
                    pending = list(dropped)
                    # Marginal cameras can thrash across the weak gate as
                    # each BA shifts the optimum (observed: drop 7 ->
                    # re-register 7 -> drop 14, ending WORSE than one
                    # round). Two hysteresis rules kill the oscillation:
                    # (a) once re-registered, a camera is re-gated at the
                    # RELAXED thresholds (deregister_weak_cameras lenient=),
                    # so the gate has a dead band; (b) each dropped camera
                    # gets exactly ONE retry (monotone) — fail the lenient
                    # gate after re-entry and it stays out. The best-state
                    # snapshot remains as a backstop.
                    best = (self.num_registered, self._snapshot_state())
                    reentered: set = set()
                    attempted: set = set()
                    for _ in range(3):
                        if not pending:
                            break
                        self.global_ba()
                        retry = [by_img[i] for i in pending
                                 if i in by_img and i not in attempted]
                        if not retry:
                            break
                        attempted.update(r.img for r in retry)
                        infos = self.register_batch(retry)
                        back = [i["img"] for i in infos
                                if i.get("status") == "registered"]
                        if not back:
                            break
                        if verbose:
                            print(f"[sfm] finalize re-registered: {back}",
                                  flush=True)
                        reentered.update(back)
                        self.global_ba()
                        pending = self.deregister_weak_cameras(lenient=reentered)
                        if pending and verbose:
                            print(f"[sfm] finalize re-dropped: {pending}",
                                  flush=True)
                        if self.num_registered > best[0]:
                            best = (self.num_registered, self._snapshot_state())
                    if self.num_registered < best[0]:
                        if verbose:
                            print(f"[sfm] finalize restoring best gated "
                                  f"state ({best[0]} cameras)", flush=True)
                        self._restore_state(best[1])
                self.global_ba(final=True)
        mean_err, n_obs = self.mean_reprojection_error()
        per_cam = self.per_camera_reproj()
        low_conf: List[int] = []
        if getattr(self.cfg, "register_all", False) and registrations:
            low_conf = self.register_low_confidence(registrations,
                                                    verbose=verbose)
        track_ids = np.flatnonzero(self.point_valid)
        registered = np.flatnonzero(self.has_cam)
        return Reconstruction(
            image_names=list(image_names),
            registered=registered,
            cams=self.cams[registered].copy(),
            points=self.points[track_ids].copy(),
            colors_bgr=self.point_color[track_ids].copy(),
            track_ids=track_ids,
            mean_reproj_px=mean_err,
            num_obs=n_obs,
            low_confidence=np.asarray(sorted(low_conf), np.int64),
            per_cam_reproj_px=per_cam,
        )

    def register_low_confidence(self, registrations,
                                verbose: bool = False) -> List[int]:
        """--register-all pass (SfMConfig.register_all): place every still-
        unregistered image by relaxed relative-pose chaining AFTER the
        final BA. Placed cameras carry NO observations — they cannot move
        the gauge, the points, or the reported reprojection error; they
        exist so a user of the reference (which never rejects anything,
        sfm.py:139-143) finds every camera present, each honestly marked.
        Chained rounds let an image whose only edges point at another
        low-confidence camera register one round later."""
        by_img = {r.img: r for r in registrations}
        placed: List[int] = []
        for _ in range(3):
            progress = False
            for img, reg in by_img.items():
                if self.has_cam[img]:
                    continue
                info: dict = {"img": img}
                cam = self._relative_pose_fallback(img, reg.edges, info,
                                                   relaxed=True)
                if cam is None:
                    continue
                self.cams[img] = cam
                self.has_cam[img] = True
                self.num_registered += 1
                self.reg_order.append(img)
                placed.append(img)
                progress = True
                if verbose:
                    print(f"[sfm] low-confidence registration: img {img} "
                          f"({info.get('fallback_relpose_inliers')})",
                          flush=True)
            if not progress:
                break
        return placed
