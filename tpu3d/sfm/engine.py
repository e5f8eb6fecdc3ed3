"""Incremental SfM engine.

The registration chain is inherently sequential (each pair depends on all
previously triangulated tracks — ref sfm.py:101-131), so the *loop* lives on
the host; everything *inside* a step is a fixed-shape jitted kernel:

  per pair:  E-RANSAC (geometry/estimators) → PnP-RANSAC (geometry/pnp)
             → batched DLT triangulation → two-view Schur-LM BA (ba/lm)
  periodic:  global Schur-LM BA over every registered camera + track

Differences from the reference, by design (strictly stronger):
  - pair BA uses BOTH views' residuals with camera i frozen (the
    reference's per-pair BA projects only into camera j, sfm.py:87-91);
  - a *global* BA exists (the reference has none, SURVEY §2 quirk list);
  - new-point acceptance = cheirality in both final cameras + reprojection
    gate, instead of the relative-pose-only mask of sfm.py:118.

All per-pair device buffers are padded to `match_capacity` so each kernel
compiles exactly once; global BA shapes are bucketed to powers of two.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.ba.lm import bundle_adjust
from tpu3d.ba.residuals import reprojection_residuals
from tpu3d.config import SfMConfig
from tpu3d.core import lie
from tpu3d.geometry.estimators import find_essential_ransac
from tpu3d.geometry.pnp import pnp_ransac
from tpu3d.geometry.triangulate import triangulate_dlt
from tpu3d.sfm.scene import Reconstruction


@dataclasses.dataclass
class PairObservations:
    """One matched pair, already track-resolved (output of the matching
    stage). Arrays are padded to the engine's match capacity."""

    img0: int
    img1: int
    idx0: np.ndarray       # (C,) keypoint index in img0
    idx1: np.ndarray       # (C,)
    track: np.ndarray      # (C,) global track id (-1 in padding)
    uv0: np.ndarray        # (C, 2) centered coords
    uv1: np.ndarray        # (C, 2)
    valid: np.ndarray      # (C,) bool
    colors0: np.ndarray    # (C, 3) uint8 BGR of img0 keypoints


@jax.jit
def _triangulate_and_gate(cam_i, cam_j, uv0n, uv1n, focal, thr_px):
    """DLT + quality gate: positive depth in both views and reprojection
    error below threshold in both views."""
    with jax.default_matmul_precision("float32"):
        return _triangulate_and_gate_body(cam_i, cam_j, uv0n, uv1n, focal, thr_px)


def _triangulate_and_gate_body(cam_i, cam_j, uv0n, uv1n, focal, thr_px):
    Ri = lie.so3_exp(cam_i[:3])
    Rj = lie.so3_exp(cam_j[:3])
    ti = cam_i[3:6]
    tj = cam_j[3:6]
    X = triangulate_dlt(Ri, ti, Rj, tj, uv0n, uv1n)
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


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
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
        # Deduplicated observation table keyed by (img, kpt).
        self._obs: Dict[Tuple[int, int], Tuple[int, float, float]] = {}
        self.key = jax.random.PRNGKey(seed)
        self.num_registered = 0
        self.pair_log: List[dict] = []

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _record_obs(self, img: int, idx: np.ndarray, track: np.ndarray, uv: np.ndarray):
        for k, t, (u, v) in zip(idx.tolist(), track.tolist(), uv.tolist()):
            key = (img, int(k))
            if key not in self._obs:
                self._obs[key] = (int(t), float(u), float(v))

    # ------------------------------------------------------------------
    def register_pair(self, pair: PairObservations) -> dict:
        cfg = self.cfg
        f = self.focal
        # Normalized coords prepared host-side: eager device ops are full
        # round-trips on remote-TPU backends, so everything outside the
        # jitted kernels stays numpy.
        uv0 = jnp.asarray(pair.uv0, jnp.float32)
        uv1 = jnp.asarray(pair.uv1, jnp.float32)
        uv0n = jnp.asarray(pair.uv0.astype(np.float32) / f)
        uv1n = jnp.asarray(pair.uv1.astype(np.float32) / f)
        valid = jnp.asarray(pair.valid.astype(np.float32))

        # ---- E-matrix RANSAC gate (ref sfm.py:108-111) ----
        eres = find_essential_ransac(
            self._next_key(), uv0, uv1, valid, f,
            threshold_px=cfg.ransac.threshold_px,
            num_hypotheses=cfg.ransac.num_hypotheses,
        )
        inl = np.asarray(eres.inliers) & pair.valid
        n_inl = int(inl.sum())
        info = {"pair": (pair.img0, pair.img1), "n_matches": int(pair.valid.sum()), "n_E_inliers": n_inl}
        if n_inl < 8:
            info["status"] = "rejected_few_inliers"
            return info

        track = pair.track
        tr_safe = np.clip(track, 0, self.points.shape[0] - 1)
        known = inl & (track >= 0) & self.point_valid[tr_safe]
        first_pair = self.num_registered == 0

        # ---- camera j pose ----
        if first_pair:
            cam_i = np.zeros(6, np.float32)
            Rj = np.asarray(eres.R)
            tj = np.asarray(eres.t)
            cam_j = np.concatenate([lie.so3_log_np(Rj), tj]).astype(np.float32)
        else:
            if not self.has_cam[pair.img0]:
                info["status"] = "rejected_ref_unregistered"
                return info
            cam_i = self.cams[pair.img0]
            n_known = int(known.sum())
            if n_known < 10:
                info["status"] = "rejected_few_known3d"
                info["n_known"] = n_known
                return info
            X_known = jnp.asarray(self.points[tr_safe])
            thr = (2.0 * cfg.ransac.threshold_px / f) ** 2
            R, t, pnp_inl, pnp_cnt = pnp_ransac(
                self._next_key(), X_known, uv1n, jnp.asarray(known.astype(np.float32)),
                thr, num_hypotheses=cfg.ransac.num_hypotheses // 2,
            )
            if int(pnp_cnt) <= cfg.min_pnp_inliers:
                info["status"] = "rejected_pnp"
                info["n_pnp_inliers"] = int(pnp_cnt)
                return info
            cam_j = np.concatenate([lie.so3_log_np(np.asarray(R)), np.asarray(t)]).astype(np.float32)
            info["n_pnp_inliers"] = int(pnp_cnt)

        # ---- triangulate new tracks (ref sfm.py:130-131, 26-34) ----
        new = inl & (track >= 0) & ~self.point_valid[tr_safe]
        X_new, good = _triangulate_and_gate(
            jnp.asarray(cam_i), jnp.asarray(cam_j), uv0n, uv1n, f,
            cfg.ransac.threshold_px * 2.0,
        )
        new = new & np.asarray(good)
        n_new = int(new.sum())

        # Write cameras (ref sfm.py:125-128).
        self.cams[pair.img1] = cam_j
        if not self.has_cam[pair.img1]:
            self.has_cam[pair.img1] = True
            self.num_registered += 1
        if first_pair and not self.has_cam[pair.img0]:
            self.cams[pair.img0] = cam_i
            self.has_cam[pair.img0] = True
            self.num_registered += 1

        if n_new:
            ids = track[new]
            self.points[ids] = np.asarray(X_new)[new]
            self.point_valid[ids] = True
            self.point_color[ids] = pair.colors0[new]

        # ---- pair BA: camera j + new points, both-view residuals ----
        use = (new | known) & inl
        if cfg.run_pair_ba and int(use.sum()) >= 8:
            self._pair_ba(pair, cam_i, use, new, tr_safe)

        # Record observations for global BA / final stats.
        obs_mask = (new | known) & inl
        if obs_mask.any():
            resolved = track[obs_mask]
            self._record_obs(pair.img0, pair.idx0[obs_mask], resolved, pair.uv0[obs_mask])
            self._record_obs(pair.img1, pair.idx1[obs_mask], resolved, pair.uv1[obs_mask])

        info.update(status="registered", n_new_points=n_new)
        if cfg.run_global_ba and self.num_registered % cfg.global_ba_every == 0:
            self.global_ba()
            info["global_ba"] = True
        self.pair_log.append(info)
        return info

    # ------------------------------------------------------------------
    def _pair_ba(self, pair: PairObservations, cam_i: np.ndarray, use: np.ndarray, new: np.ndarray, tr_safe: np.ndarray):
        f = self.focal
        cap = len(use)
        cams0 = jnp.asarray(np.stack([cam_i, self.cams[pair.img1]]))
        pts0 = jnp.asarray(self.points[tr_safe])
        w = use.astype(np.float32)
        cam_idx = np.concatenate([np.zeros(cap, np.int32), np.ones(cap, np.int32)])
        pt_idx = np.concatenate([np.arange(cap), np.arange(cap)]).astype(np.int32)
        uv = np.concatenate([pair.uv0, pair.uv1]).astype(np.float32) / f
        ww = np.concatenate([w, w])
        cam_fixed = jnp.asarray([1.0, 0.0], jnp.float32)
        # Only NEW points move (known ones are anchored by other views).
        pt_fixed = jnp.asarray((~new).astype(np.float32))
        st = bundle_adjust(
            cams0, pts0, jnp.asarray(cam_idx), jnp.asarray(pt_idx),
            jnp.asarray(uv), jnp.asarray(ww), cam_fixed, pt_fixed,
            max_iters=self.cfg.ba.max_iters // 2, cg_iters=8,
        )
        self.cams[pair.img1] = np.asarray(st.cams)[1]
        if new.any():
            ids = pair.track[new]
            self.points[ids] = np.asarray(st.points)[new]

    # ------------------------------------------------------------------
    def _gather_global_problem(self):
        if not self._obs:
            return None
        items = list(self._obs.items())
        img_ids = np.array([k[0] for k, _ in items], np.int32)
        tracks = np.array([v[0] for _, v in items], np.int64)
        uv = np.array([[v[1], v[2]] for _, v in items], np.float32) / self.focal
        live = self.point_valid[np.clip(tracks, 0, len(self.point_valid) - 1)] & self.has_cam[img_ids]
        img_ids, tracks, uv = img_ids[live], tracks[live], uv[live]
        if len(img_ids) == 0:
            return None
        cam_slots = np.flatnonzero(self.has_cam)
        cam_map = {int(c): i for i, c in enumerate(cam_slots)}
        cam_idx = np.array([cam_map[int(i)] for i in img_ids], np.int32)
        uniq_tracks, pt_idx = np.unique(tracks, return_inverse=True)
        return cam_slots, cam_idx, uniq_tracks, pt_idx.astype(np.int32), uv

    def global_ba(self, max_iters: Optional[int] = None):
        prob = self._gather_global_problem()
        if prob is None:
            return
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv = prob
        C = len(cam_slots)
        P_real = len(uniq_tracks)
        O_real = len(cam_idx)
        P = _bucket(P_real)
        O = _bucket(O_real)
        cams0 = jnp.asarray(self.cams[cam_slots])
        pts = np.zeros((P, 3), np.float32)
        pts[:P_real] = self.points[uniq_tracks]
        w = np.zeros(O, np.float32)
        w[:O_real] = 1.0
        ci = np.zeros(O, np.int32)
        ci[:O_real] = cam_idx
        pi = np.zeros(O, np.int32)
        pi[:O_real] = pt_idx
        uvp = np.zeros((O, 2), np.float32)
        uvp[:O_real] = uv
        cam_fixed = np.zeros(C, np.float32)
        cam_fixed[0] = 1.0
        pt_fixed = np.zeros(P, np.float32)
        pt_fixed[P_real:] = 1.0
        st = bundle_adjust(
            cams0, jnp.asarray(pts), jnp.asarray(ci), jnp.asarray(pi),
            jnp.asarray(uvp), jnp.asarray(w), jnp.asarray(cam_fixed), jnp.asarray(pt_fixed),
            max_iters=max_iters or self.cfg.ba.max_iters, cg_iters=32,
        )
        self.cams[cam_slots] = np.asarray(st.cams)
        self.points[uniq_tracks] = np.asarray(st.points)[:P_real]

    # ------------------------------------------------------------------
    def mean_reprojection_error(self) -> Tuple[float, int]:
        prob = self._gather_global_problem()
        if prob is None:
            return float("nan"), 0
        cam_slots, cam_idx, uniq_tracks, pt_idx, uv = prob
        r = reprojection_residuals(
            jnp.asarray(self.cams[cam_slots]), jnp.asarray(self.points[uniq_tracks]),
            jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv),
            jnp.ones(len(cam_idx), jnp.float32),
        )
        err = np.linalg.norm(np.asarray(r), axis=-1) * self.focal
        return float(err.mean()), len(err)

    def finalize(self, image_names: Sequence[str]) -> Reconstruction:
        if self.cfg.run_global_ba:
            self.global_ba()
        mean_err, n_obs = self.mean_reprojection_error()
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
        )
