"""Reference `output/` artifact-protocol exporter.

The reference's stages communicate exclusively through files in an
`output/` directory (SURVEY §1 artifact table): img_list.txt
(feature_extraction.py:15,24), all_points/all_descriptors/all_colors/
img_size (.npy, feature_extraction.py:41-50), img_pairs/all_matches
(matching.py:188-189), reconstructed_img.txt (sfm.py:139-142),
cameras_extrinsic.npy / points_3d.npy / result.ply (sfm.py:145-147).

This module writes that exact protocol from tpu3d's artifact store, so
downstream consumers built against the reference (its sdf.py/plenoxel.py
loaders, numpy2ply.py, external viewers/scripts) work unchanged on our
reconstructions. Per-image arrays are object arrays of valid-subset rows,
matching the reference's ragged list-of-arrays layout.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def export_reference_layout(artifact_dir: str, out_dir: str) -> dict:
    """Write the reference's full output/ protocol from saved artifacts.

    Requires features (always), and optionally matches + reconstruction
    (whatever is present is exported). Returns a manifest of files written.
    """
    from tpu3d.io.artifacts import ArtifactStore
    from tpu3d.io.ply import write_ply

    store = ArtifactStore(artifact_dir)
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    feats = store.load("features")
    fmeta = store.load_json("features_meta")
    if feats is None or fmeta is None:
        raise FileNotFoundError(f"no features artifact in {artifact_dir}")
    names = fmeta["names"]
    valid = feats["valid"]

    with open(os.path.join(out_dir, "img_list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    written["img_list.txt"] = len(names)

    def ragged(field):
        return np.asarray([feats[field][i][valid[i]] for i in range(len(names))],
                          dtype=object)

    # Keypoints in the reference convention: centered at the principal
    # point, y up (feature_extraction.py:34) — tpu3d's native convention.
    np.save(os.path.join(out_dir, "all_points.npy"), ragged("keypoints"),
            allow_pickle=True)
    np.save(os.path.join(out_dir, "all_descriptors.npy"), ragged("descriptors"),
            allow_pickle=True)
    np.save(os.path.join(out_dir, "all_colors.npy"), ragged("colors_bgr"),
            allow_pickle=True)
    np.save(os.path.join(out_dir, "img_size.npy"), feats["image_size"])
    written["all_points/descriptors/colors, img_size"] = int(valid.sum())

    # BoW codebook in the reference's exact (k, codebook) joblib layout
    # (bow.py:25) — its matching.py loads this with joblib at line 16. Built
    # here from the exported descriptors with the on-device kmeans.
    try:
        import jax
        import jax.numpy as jnp
        import joblib

        from tpu3d.matching.bow import build_codebook

        # ref bow.py:7 uses k=200; clamp to the descriptor count so tiny
        # exports (tests, subsets) stay valid — kmeans needs k <= n points.
        k = min(200, int(valid.sum()))
        codebook = np.asarray(build_codebook(
            jax.random.PRNGKey(0), jnp.asarray(feats["descriptors"]),
            jnp.asarray(valid), k=k))
        joblib.dump((k, codebook), os.path.join(out_dir, "bow_codebook.plk"))
        written["bow_codebook.plk"] = k
    except ImportError:
        pass  # joblib absent: every numpy/txt artifact above is still valid

    regs = _load_regs(artifact_dir, len(names), feats["keypoints"].shape[1])
    if regs is not None:
        img_pairs = []
        all_matches = []
        for r in regs:
            for e in r.edges:
                img_pairs.append((e.ref_img, r.img))
                all_matches.append([e.idx_ref, e.idx_new, e.track])
        np.save(os.path.join(out_dir, "img_pairs.npy"), np.asarray(img_pairs))
        # (P, 3) ragged object array — element-wise fill; np.asarray would
        # try to broadcast same-length index arrays into a dense block.
        am = np.empty((len(all_matches), 3), dtype=object)
        for i, m in enumerate(all_matches):
            am[i, 0], am[i, 1], am[i, 2] = m
        np.save(os.path.join(out_dir, "all_matches.npy"), am, allow_pickle=True)
        written["img_pairs/all_matches"] = len(img_pairs)

    rec = store.load("reconstruction")
    rmeta = store.load_json("reconstruction_meta")
    if rec is not None and rmeta is not None:
        with open(os.path.join(out_dir, "reconstructed_img.txt"), "w") as f:
            f.write("\n".join(rmeta["registered_names"]) + "\n")
        np.save(os.path.join(out_dir, "cameras_extrinsic.npy"), rec["extrinsics"])
        np.save(os.path.join(out_dir, "points_3d.npy"), rec["points"])
        write_ply(os.path.join(out_dir, "result.ply"), rec["points"],
                  rec["colors_bgr"])
        written["reconstructed_img/cameras_extrinsic/points_3d/result.ply"] = \
            int(len(rec["points"]))
    return written


def _load_regs(artifact_dir: str, n_images: int, kpts_per_image: int):
    from tpu3d.io.matches import load_matches

    try:
        loaded = load_matches(artifact_dir, n_images, kpts_per_image,
                              max_tracks=4_000_000)
    except Exception:
        return None
    if loaded is None:
        return None
    regs, _, _ = loaded
    return regs
