"""Central configuration.

The reference hard-codes and duplicates every constant across its scripts
(focal length 2378.98305085 at sfm.py:24 / matching.py:92 / sdf.py:54;
BoW k=200 at bow.py:7; retrieval top_k/threshold at matching.py:51,69;
RANSAC prob/threshold at sfm.py:108; grid resolutions / lr / batch sizes at
sdf.py:274,411-421 and plenoxel.py:128-133). Here they live in typed,
documented dataclasses with a single source of truth.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def resolve_sfm_backend(backend: str) -> str:
    """Single source of truth for SfMConfig.backend resolution: "auto" ->
    "hybrid" on accelerator sessions, plain "default" on CPU sessions.
    Shared by pipeline._sfm_device_ctx (outer placement) and
    engine._ba_device_ctx (BA lift) so the two can never drift apart."""
    if backend == "auto":
        import jax

        return "hybrid" if jax.default_backend() != "cpu" else "default"
    return backend


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole intrinsics. The reference uses K = diag(f, f, 1) with a zero
    principal point, valid because keypoints are stored in *centered* image
    coordinates (x - W/2, -(y - H/2)) — feature_extraction.py:34, sfm.py:104.
    We keep that convention: it makes K diagonal and the math symmetric."""

    focal_length: float = 2378.98305085  # ref sfm.py:24 (ystad_kloster)


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Classical (SIFT-style) TPU-native feature front-end.

    The reference extracts DISK keypoints with max_num_keypoints=2048
    (feature_extraction.py:10). We keep the same keypoint budget so the rest
    of the pipeline sees identical shapes."""

    # Front-end model. "classical" is the weight-free DoG/SIFT-style path;
    # "disk" / "superpoint" run the learned Flax forwards (features/disk.py,
    # features/superpoint.py) and require `weights` to point at a torch
    # checkpoint (.pth, converted on load) or a pre-converted .npz.
    # The reference's production front-end is DISK (feature_extraction.py:28).
    model: str = "classical"
    weights: str = ""
    max_keypoints: int = 2048
    num_octaves: int = 4
    scales_per_octave: int = 3
    sigma0: float = 1.6
    contrast_threshold: float = 0.006
    edge_threshold: float = 10.0
    nms_radius: int = 2
    descriptor_patch_scale: float = 6.0  # descriptor support = scale * sigma
    # Upright mode: skip the dominant-orientation estimate (theta = 0),
    # removing one of the two per-keypoint sampling dispatches. Measured
    # NEGATIVE on ystad_kloster (23/24 @ 0.842 px vs 24/24 @ 0.752 with
    # orientations, 26% fewer points) — the walk-around capture has enough
    # roll variation that canonicalization pays for itself. An option for
    # tripod/aerial captures only.
    upright: bool = False
    # Fused orientation+descriptor Pallas kernel (kernels/orient_desc.py).
    # TPU-measured SLOWER than the split two-dispatch path at the
    # production shape (609 vs 464 ms/batch — see orient_and_describe);
    # None/False = split path, True opts in for perf experiments.
    fused_descriptor: bool | None = None
    # Images per device batch. 4 is the proven-safe size for the TPU
    # backend's scalar register allocator on the descriptor gather graph;
    # the per-image cost is ~1ms so batching higher buys little.
    batch_size: int = 4
    # Detector top-k selection: 0.0 = exact lax.top_k (a full TPU sort over
    # the ~2M-element octave score map); in (0, 1] = lax.approx_max_k with
    # this recall target — the TPU-native partial-reduction selector. NMS'd
    # score maps are ~99.9% zeros, so sub-1.0 recall loses only threshold-
    # adjacent keypoints; quality must be A/B'd per dataset.
    approx_topk_recall: float = 0.0
    # MXU precision for the per-keypoint patch-sampling matmuls
    # (kernels/patch_sample.py): "highest" = 6-pass bf16 (exact f32),
    # "default" = single-pass bf16 (Mosaic has no 3-pass HIGH; "high" maps
    # to highest). The descriptor stage is compute-bound on these matmuls;
    # bf16 perturbs descriptor samples ~1e-2 absolute (quality A/B
    # required — f32 scoping elsewhere was load-bearing, BASELINE.md).
    patch_precision: str = "highest"
    # Separate precision for the ORIENTATION pass only (None = follow
    # patch_precision): the 36-bin histogram argmax is far more tolerant
    # of sample noise than the descriptor values, and the orientation
    # matmuls are ~40% of the per-keypoint sampling compute.
    orient_precision: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    """BoW tf-idf pair retrieval (ref bow.py + matching.py:22-82)."""

    codebook_size: int = 200      # ref bow.py:7
    kmeans_iters: int = 10        # ref uses 1 (bow.py:8); more is strictly better
    top_k: int = 10               # ref matching.py:51
    # ref matching.py:69 uses 0.75 for DISK tf-idf vectors; the classical
    # descriptors' similarity scale runs lower, and min_neighbors below
    # keeps the graph connected regardless.
    similarity_threshold: float = 0.5
    min_neighbors: int = 3        # always keep this many top neighbors
    # Photo sequences (like ystad_kloster's walk-around capture) have a
    # strong temporal prior: always include (i, i±1), (i, i±2) edges. The
    # E-matrix gate discards any that don't actually overlap.
    sequential_prior: int = 2     # 0 disables


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    """Descriptor matching + pair acceptance gates (ref matching.py:84-189)."""

    ratio_threshold: float = 0.95      # Lowe ratio for mutual-NN matcher
    min_raw_matches: int = 50          # early-skip gate (ref >8, matching.py:130)
    # Primary-edge acceptance gate (ref matching.py:160 uses 500 for DISK's
    # 2048 high-recall matches; the classical frontend yields fewer raw
    # matches at equal quality, so the default is lower).
    min_pair_matches: int = 100
    min_first_pair_inliers: int = 100  # bootstrap pair must be strong
    min_inliers: int = 10              # ref matching.py:144 (> 10)
    # ref matching.py:160 uses 0.3, needed there because its PnP depends on
    # a single pair's shared tracks; our engine gates registration on the
    # joint PnP inlier count instead, so the matching-time overlap gate is
    # only a weak prior.
    min_track_overlap: float = 0.1
    # Order-free reference selection (r5): each image's reference edges are
    # ranked by cheirality-inlier count from the CACHED per-edge gate
    # results instead of BFS traversal order. The legacy BFS consume picks
    # refs by discovery order, which amplifies ULP-level gate-numerics
    # changes into 27% edge-set reshuffles and 6-11 cameras of engine
    # recall variance (ROUND5_NOTES gate A/B). False = legacy consume.
    canonical_select: bool = True
    ransac_threshold_px: float = 1.0   # ref matching.py:134
    # Matcher. "mnn" = mutual-NN + ratio test (weight-free); "lightglue"
    # runs the Flax LightGlue forward (matching/lightglue.py, the
    # reference's matcher at matching.py:122) and requires `weights`
    # (torch .pth checkpoint or pre-converted .npz).
    matcher: str = "mnn"
    weights: str = ""
    # Candidate edges gated per device dispatch. All candidate edges are
    # precomputed in vmapped blocks of this size and the BFS consumes the
    # cache; 1 falls back to the sequential per-edge path. TPU-measured
    # (match_bench with per-rep-fresh inputs): device compute is ~1 ms per
    # block while the remote client charges ~0.2-0.7 s PER EXECUTE — the
    # block size is purely a dispatch-count knob, so go big. 32 blocks of
    # 2048-kpt pairs peak ~270 MB of bf16 distance matrices.
    pair_batch: int = 32
    # Prematch sequential-prior edges during the extraction loop. OFF for
    # single-process runs: TPU-measured, extraction is device-bound, so
    # interleaving match blocks just serializes the same work and the
    # offsets-(1,2,3) edge set adds ~10% edges the retrieval graph never
    # asks for (bench extract 2.97 -> 3.4 s, match 0.47 -> 0.44: net
    # NEGATIVE). The cross-host stage-overlap path (dist/overlap.py)
    # always prematches — there the match work runs on process 0 while
    # OTHER hosts extract, a genuine overlap.
    prematch: bool = False
    # Last-chance pass for images the BFS + retry never reached: gate up to
    # this many visited 2-hop view-graph neighbors per missing image
    # (one extra batched dispatch). 0 disables.
    rescue_candidates: int = 16


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Batched-hypothesis RANSAC (replaces cv2's serial RANSAC).

    Instead of data-dependent early exit (impossible under jit), we draw a
    fixed hypothesis budget and score all of them in one batched kernel."""

    num_hypotheses: int = 512
    threshold_px: float = 1.0          # ref sfm.py:108 (threshold=1)
    seed: int = 0
    # Minimal solver for the essential matrix. The 5-point Nistér solver
    # (geometry/fivepoint.py) is the default: it matches the reference's
    # cv2 kernel choice, handles planar scenes, and measured better on
    # the full dataset — its E-gate prunes bad view-graph edges that the
    # 8-point gate lets through (276/290 @ 0.511 px with 3x better
    # trajectory coherence vs 266/290 @ 0.567 px; BASELINE.md). The
    # cheaper 8-point solver remains available (use_five_point=False).
    use_five_point: bool = True


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Levenberg–Marquardt bundle adjustment with camera-reduced Schur
    complement (replaces scipy.optimize.least_squares at sfm.py:38)."""

    max_iters: int = 20
    # Mid-run iteration budget: growth-gated global BAs and windowed BAs
    # re-solve a nearly-converged problem that gets refined again anyway;
    # TPU-measured they run their full 20x32 LM/CG budget at ~0.34 s per
    # LM iteration (~13 s/call). A/B on the full run: 8x16 cut global BA
    # 240->115 s but cost 10 cameras of recall and 0.1 px of mean error;
    # 12x24 is the quality-preserving middle. Finalize runs the full
    # budget either way.
    mid_max_iters: int = 12
    mid_cg_iters: int = 24
    # Refit-after-prune on MID-RUN global BAs. The final BA always
    # prune-refits; mid-run refits re-solve a problem the next growth-
    # gated BA re-solves anyway (measured r4: refit walls ~= main-solve
    # walls, ~70 s of the full run's 194 s global-BA bill). False defers
    # the refit to the next BA: the pruned weights take effect there.
    midrun_refit: bool = True
    lm_lambda_init: float = 1e-3
    lm_lambda_up: float = 3.0
    lm_lambda_down: float = 3.0
    ftol: float = 1e-8                 # ref sfm.py:38 ftol=1e-8
    # Huber threshold for the GLOBAL BA in pixels (None = plain L2). The
    # reference's scipy BA is pure L2 — its 4-9px mean-error tail is partly
    # outlier leverage this removes.
    robust_huber_px: float = 3.0


@dataclasses.dataclass(frozen=True)
class SfMConfig:
    camera: CameraConfig = CameraConfig()
    ransac: RansacConfig = RansacConfig()
    ba: BAConfig = BAConfig()
    min_pnp_inliers: int = 10          # ref matching.py:144 / sfm acceptance
    # Frontier-registration chunk: images per fused PnP+triangulation
    # dispatch (engine.register_batch). Each dispatch over the remote-TPU
    # tunnel costs ~200 ms of round trip vs ~10 ms of PnP compute; the
    # fixpoint retry rounds absorb intra-chunk anchor staleness. 1 =
    # strictly sequential registration.
    register_batch: int = 8
    max_tracks: int = 400_000          # preallocated global track capacity
    match_capacity: int = 2048         # per-pair padded match capacity
    # Engine dispatch backend. "cpu" pins the registration/BA kernels to
    # the host CPU while extract/match stay on the accelerator — on a
    # remote-TPU tunnel the engine's many small dispatches are round-trip-
    # bound, and the CPU backend is also the one with the best-measured
    # registration recall (pipeline._sfm_device_ctx). "hybrid" = CPU
    # registration + accelerator windowed/global BA (the solves are
    # throughput work the TPU wins; engine._ba_device_ctx). "auto"
    # (default) resolves to hybrid on accelerator sessions and plain
    # default on CPU sessions — measured 6.98 -> 5.0 s on the 24-image
    # bench and 277 -> 288/290 recall on the full dataset.
    backend: str = "auto"
    # Register EVERY image: after the final BA, place still-unregistered
    # cameras by relaxed relative-pose chaining (no MAD/majority gates) and
    # mark them low-confidence — excluded from the BA gauge (they carry no
    # observations) and from dense training by default. Matches the
    # reference's never-reject 290/290 count (sfm.py:139-143) without
    # letting drift-polluted cameras touch quality. Off by default.
    register_all: bool = False
    min_new_points: int = 1            # triangulate if any new points (sfm.py:130)
    run_pair_ba: bool = True
    run_global_ba: bool = True         # new capability (reference has none)
    global_ba_every: int = 8           # run global BA every N registrations
    # Geometric cadence: additionally require the problem to have GROWN by
    # this factor since the last global BA (COLMAP-style). Every-N keeps
    # re-solving the nearly unchanged full problem (cost grows linearly
    # with registered cameras, so the tail dominates); growth-gated BAs
    # cut total global-BA work ~4x at 290 images. 1.0 disables the gate.
    global_ba_growth: float = 1.12
    # Windowed (COLMAP-style local) BA over the most recent N registered
    # cameras on the every-N ticks the growth gate skips: O(window) cost,
    # keeps the chain frontier tight between full global BAs.
    local_window: int = 25
    # Deregister cameras whose pose disagrees with the majority of their
    # own two-view edges. OFF by default: measured on ystad_kloster, the
    # E-gate relative poses (small-baseline pairs) are noisier than the
    # BA-refined cameras they would judge — the gate dropped 126/290 at
    # rot_thr 12 deg, mostly good cameras. Useful only with generous
    # thresholds on graphs with long-baseline edges.
    edge_consistency_gate: bool = False


@dataclasses.dataclass(frozen=True)
class DenseConfig:
    """Dense voxel radiance reconstruction (ref sdf.py / plenoxel.py)."""

    grid_resolution: int = 256         # ref plenoxel.py:128 N=256 / sdf.py 250
    sh_degree: int = 2                 # 9 coeffs per color channel (27 + 1 density)
    num_samples: int = 192             # ref plenoxel.py:133 nb_bins=192 (sdf: 160)
    near: float = 2.0                  # ref plenoxel.py:133 hn=2
    far: float = 6.0                   # ref plenoxel.py:133 hf=6
    scene_scale: float = 1.5           # ref plenoxel.py:21 scale=1.5 / sdf.py:63
    batch_size: int = 2048             # ref sdf.py:421 / plenoxel.py:104
    learning_rate: float = 1e-2        # ref sdf.py:417 / plenoxel.py:129
    # Grid optimizer: "adam" (ref choice; TWO moment buffers -> 4 grid-
    # sized arrays live, caps a 16 GB chip at 288^3) or "rmsprop" (the
    # Plenoxels paper's optimizer; ONE moment -> 320-352^3 fit).
    optimizer: str = "adam"
    lr_milestones: Tuple[int, ...] = (2, 4, 8)  # ref MultiStepLR milestones
    lr_gamma: float = 0.5
    epochs: int = 1                    # ref sdf.py:411
    white_background: bool = True      # ref compositing adds (1 - acc)
    hierarchical: bool = False         # coarse->fine importance sampling
    # Radial scene contraction (dense/contract.py): grid spans [-2,2]^3
    # with the scene core linear in the inner unit ball and all far
    # content representable in the outer shell; sampling adds a disparity
    # background tail. The structural fix for the ~1-2.5% voxel
    # utilization measured on linear normalizations (dense_norm_probe).
    contraction: bool = False
    n_coarse: int = 64                 # density-only pass samples
    n_fine: int = 64                   # importance samples (total = sum)
    per_ray_aabb: bool = True          # clip each ray's band to the grid box
    density_activation: str = "relu"   # ref sdf.py:376-377 relu(sdf)
    # Occupancy-pruned marching (the nerfacc-style acceleration the
    # reference declares but never ships — requirement.txt:8,
    # voxel_travesal.py): tighten each ray's band to occupied space.
    occupancy_prune: bool = False
    occupancy_factor: int = 4          # coarse cell = factor^3 voxels
    # Occupied = density whose per-sample alpha contribution is material:
    # alpha = 1 - exp(-sigma*delta) with delta ~ band/128 ~ 0.01 scene
    # units, so sigma=0.5 contributes alpha ~ 0.5%. (A threshold near the
    # grid's 0.01 init classifies everything ever touched as occupied and
    # prunes nothing — measured as a bit-identical no-op on the full run.)
    occupancy_threshold: float = 0.5
    occupancy_probes: int = 128        # band probes per ray
    occupancy_every: int = 500         # refresh cadence (train steps)
    # Coarse-to-fine grid growing (Plenoxels-style): train the first
    # `coarse_epochs` epochs on a grid downscaled by `coarse_factor`, then
    # trilinearly upsample (align-corners, exact at coarse nodes) and
    # continue at full resolution. 0 = disabled. The coarse phase fills in
    # smooth global structure ~factor^3 faster and regularizes the fine
    # phase's initialization.
    coarse_epochs: int = 0
    coarse_factor: int = 2
    # Training steps scanned inside one device dispatch (lax.scan over a
    # device-resident ray dataset). Each dispatch on the remote-TPU tunnel
    # pays a ~0.1-0.2 s host round trip; at 2048-ray batches that overhead
    # capped training at ~8.7k rays/s vs the kernel pair's ~4x headroom.
    # 1 = legacy one-dispatch-per-step.
    scan_chunk: int = 16
    # Stochastic total-variation regularization (the Plenoxels paper's key
    # ingredient — the reference cites the paper but never implements TV).
    # Each step penalizes squared neighbor differences on a random
    # tv_crop^3 sub-block (full-grid TV at 256^3 x 28 would double the
    # step's memory traffic). Weights are per-channel-group: sigma =
    # density channel 0, sh = the 27 SH color channels. 0 disables.
    tv_sigma: float = 0.0
    tv_sh: float = 0.0
    tv_crop: int = 32
    # Per-image exposure compensation (NeRF-W-style, 3 log-gains per train
    # camera, jointly optimized): outdoor captures like ystad_kloster are
    # shot on auto-exposure, so the same surface photographs at different
    # intensities across views — without a per-image latent the grid learns
    # the average and every view pays the variance as MSE. Rendering uses
    # gain 1 (the canonical exposure); held-out eval reports raw AND
    # half-image-calibrated PSNR (dense/eval.py).
    exposure: bool = False
    exposure_lr: float = 1e-2
    # Learnable view-directional background (3 x 9 SH coefficients,
    # initialized to white): the reference composites residual
    # transmittance over hard white (sdf.py:402, plenoxel.py:93), but an
    # outdoor sky is neither white nor constant — the grid then wastes
    # density on "sky fog" and every sky pixel pays (1-sky)^2 MSE. Jointly
    # optimized like the exposure latents; rendering/eval use the learned
    # coefficients.
    sh_background: bool = False
    background_lr: float = 1e-2
    # Cauchy density-sparsity prior (Plenoxels paper's sparsity loss):
    # lambda * mean(log(1 + sigma^2/0.25)) on a random crop per step.
    # Drives unobserved/fog voxels to zero — the prior that lets the SH
    # background (not fog) explain the sky, and the occupancy pruner
    # actually prune. 0 disables.
    sparsity_sigma: float = 0.0
    # Dense-side camera gate (r3 provenance finding, ROUND3_NOTES): on the
    # same recipe, four reconstructions spread 14.5-18.7 dB with single bad
    # cameras/views dominating the tail — the 289-cam 0.604 px rec (best
    # sparse output) densified WORST. After `camera_gate_epoch` epochs,
    # per-train-camera probe MSE is measured and cameras whose loss is a
    # robust outlier (median + camera_gate_mad x 1.4826 x MAD) are dropped
    # from the remaining epochs' sampling — a camera whose POSE is wrong
    # has high loss the grid cannot fix, and keeping it blurs every voxel
    # it sees. At most (1 - camera_gate_min_keep) of cameras can drop.
    camera_gate: bool = False
    camera_gate_epoch: int = 2
    camera_gate_mad: float = 3.0
    camera_gate_min_keep: float = 0.85
    camera_gate_probe_rays: int = 2048


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data = ray/image/observation batch axis;
    model = voxel-brick / Schur-block axis."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1            # -1: all devices on data axis
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    camera: CameraConfig = CameraConfig()
    frontend: FrontendConfig = FrontendConfig()
    retrieval: RetrievalConfig = RetrievalConfig()
    matching: MatchingConfig = MatchingConfig()
    sfm: SfMConfig = SfMConfig()
    dense: DenseConfig = DenseConfig()
    mesh: MeshConfig = MeshConfig()
    image_dir: Optional[str] = None
    artifact_dir: str = "artifacts"
