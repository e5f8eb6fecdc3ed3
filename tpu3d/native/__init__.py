"""Native (C++) host-runtime bindings, loaded via ctypes.

The device path of this framework is JAX/XLA/Pallas; this package covers
the host-runtime loops that can neither batch onto the device nor
vectorize in numpy — sequential union-find track bookkeeping and the
observation-table insert (the reference delegates its equivalents to
OpenCV/tork C++ loops; SURVEY §2.2). Every entry point has a pure-Python
fallback so the framework works without a compiler; tests assert exact
equivalence between the two.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from tpu3d.native.build import ensure_built

        path = ensure_built()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i64 = ctypes.c_int64
        p64 = ctypes.POINTER(ctypes.c_int64)
        pu8 = ctypes.POINTER(ctypes.c_uint8)
        pf32 = ctypes.POINTER(ctypes.c_float)
        lib.ts_resolve.argtypes = [p64, p64, i64]
        lib.ts_resolve.restype = None
        lib.ts_union_pair.argtypes = [p64, i64, p64, i64, i64, i64, p64, p64, i64, i64, p64]
        lib.ts_union_pair.restype = i64
        lib.ts_record_obs.argtypes = [pu8, p64, pf32, i64, i64, p64, p64, pf32, i64]
        lib.ts_record_obs.restype = i64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def resolve(parent: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Canonicalize track ids in place on a COPY (API-compatible with
    TrackStore.resolve); mutates parent (path compression)."""
    lib = _load()
    out = np.ascontiguousarray(ids, np.int64).copy()
    if lib is None:
        raise RuntimeError("native library unavailable")
    flat = out.reshape(-1)
    lib.ts_resolve(_p64(parent), _p64(flat), len(flat))
    return out.reshape(ids.shape)


def union_pair(parent: np.ndarray, kp_track: np.ndarray, img0: int, img1: int,
               idx0: np.ndarray, idx1: np.ndarray, next_track: int) -> tuple:
    """Returns (track_ids (M,), new_next_track). Raises on capacity."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    idx0 = np.ascontiguousarray(idx0, np.int64)
    idx1 = np.ascontiguousarray(idx1, np.int64)
    out = np.empty(len(idx0), np.int64)
    nt = lib.ts_union_pair(
        _p64(parent), len(parent), _p64(kp_track), kp_track.shape[1],
        img0, img1, _p64(idx0), _p64(idx1), len(idx0), next_track, _p64(out),
    )
    if nt < 0:
        raise RuntimeError("TrackStore capacity exceeded")
    return out, int(nt)


def record_obs(valid: np.ndarray, track: np.ndarray, uv: np.ndarray,
               kpts_per_image: int, img: int,
               idx: np.ndarray, tr: np.ndarray, uv_in: np.ndarray) -> int:
    """First-wins insert into the dense observation table. valid: (N*K,)
    uint8; track: (N*K,) int64; uv: (N*K, 2) float32 — flat views."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    idx = np.ascontiguousarray(idx, np.int64)
    tr = np.ascontiguousarray(tr, np.int64)
    uv_in = np.ascontiguousarray(uv_in, np.float32)
    return int(lib.ts_record_obs(
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _p64(track),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        kpts_per_image,
        img, _p64(idx), _p64(tr),
        uv_in.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(idx),
    ))
