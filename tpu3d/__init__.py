"""tpu3d — a TPU-native incremental Structure-from-Motion + dense voxel
reconstruction framework (JAX / XLA / Pallas / pjit).

Re-designed from scratch with the capabilities of the reference pipeline
(daovietanh190499/3D_Reconstruction): feature extraction, BoW retrieval,
learned + classical matching, incremental SfM (E-RANSAC, PnP, triangulation,
Schur-complement bundle adjustment) and dense voxel radiance reconstruction
(SDF grid + plenoxel), all as batched, jittable, mesh-shardable JAX programs.

Layering (mirrors reference layer map in SURVEY.md §1, but as one package
with typed in-memory interfaces instead of an ``output/*.npy`` filesystem
protocol):

    L1 features/   — keypoint detection + description   (ref: feature_extraction.py)
    L2 matching/   — BoW retrieval, matching, tracks    (ref: bow.py, matching.py)
    L3 geometry/ + ba/ + sfm/ — incremental SfM         (ref: sfm.py)
    L4 dense/      — voxel radiance fields              (ref: sdf.py, plenoxel.py)
    L5 io/         — artifact store, PLY export         (ref: numpy2ply.py)
    dist/          — device mesh + sharding (new; reference is single-device)
    kernels/       — Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"

# Multi-view geometry (8-point, AtA eigensolves, BA normal equations) needs
# true float32 accumulation; the TPU MXU's default bf16 matmul precision
# silently destroys it (observed: E-RANSAC inlier rates collapsing on TPU
# while identical code passes on CPU). The fix is SCOPED, not global: each
# geometry/BA entry point traces its body under
# `jax.default_matmul_precision("float32")` (see geometry/, ba/), while
# throughput paths (frontend convs, descriptor matmuls, dense rendering)
# keep the fast default — a global "highest" sends the 2048x2048
# descriptor-similarity matmul into a pathological TPU compile.

# Persistent XLA compilation cache: compiles cost ~25 s apiece over the
# remote-TPU tunnel and are a per-deployment one-off, not a per-scene cost.
# Verified to work for the remote backend (serialized executables land in
# the cache dir and later processes skip the compile). Opt out with
# TPU3D_COMPILE_CACHE=0.
import os as _os

_cache = _os.environ.get("TPU3D_COMPILE_CACHE",
                         _os.path.expanduser("~/.cache/tpu3d_xla"))
if _cache and _cache != "0":
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
del _os
