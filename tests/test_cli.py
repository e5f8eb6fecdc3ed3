"""CLI smoke test: extract -> reconstruct through the artifact store."""
import json
import os

import pytest

DATASET = "/root/reference/ystad_kloster"


@pytest.mark.skipif(not os.path.isdir(DATASET), reason="dataset not available")
def test_cli_extract_reconstruct(tmp_path, capsys):
    from tpu3d.cli import main

    art = str(tmp_path / "artifacts")
    common = [
        "--images", DATASET, "--artifacts", art,
        "--downscale", "4", "--limit", "5",
        "--max-keypoints", "512", "--max-tracks", "20000",
        "--ransac-hypotheses", "128", "--quiet",
    ]
    main(["extract", *common])
    assert os.path.exists(os.path.join(art, "features.npz"))

    ply = str(tmp_path / "out.ply")
    main(["reconstruct", *common, "--ply", ply])
    out = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out[-1])
    assert stats["registered"] >= 3
    assert stats["mean_reproj_px"] < 2.0
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(art, "reconstruction.npz"))


def test_cli_densify_from_reference_ray_pickle(tmp_path, capsys):
    """densify --rays-pkl trains from the reference's external training_data
    protocol (sdf.py:420: pickled (N,9) [origin, dir, rgb] rows)."""
    import numpy as np

    from tpu3d.cli import main
    from tpu3d.io.raydata import load_ray_dataset, save_ray_dataset
    from tpu3d.dense.train import RayDataset

    rng = np.random.default_rng(0)
    n = 4096
    # rays through a unit cube scene: origins on a shell, dirs toward center
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rgb = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    pkl = str(tmp_path / "training_data.pkl")
    save_ray_dataset(pkl, RayDataset(o, d, rgb))

    ds = load_ray_dataset(pkl)
    assert ds.origins.shape == (n, 3)
    np.testing.assert_allclose(np.linalg.norm(ds.dirs, axis=-1), 1.0, atol=1e-5)

    art = str(tmp_path / "art")
    main([
        "densify", "--images", ".", "--artifacts", art,
        "--rays-pkl", pkl, "--test-rays-pkl", pkl,
        "--grid-resolution", "16", "--num-samples", "8",
        "--near", "1.0", "--far", "5.0",
        "--no-checkpoint", "--quiet",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out[-1])
    assert stats["final_loss"] is not None
    assert np.isfinite(stats["test_psnr"])


@pytest.mark.skipif(not os.path.isdir(DATASET), reason="dataset not available")
def test_cli_cascade_process_chain(tmp_path, capsys):
    """The 3-process cascade chain (base --final-grid / --detail-only /
    --eval-only): each phase in its own process is the OOM-proof shape on
    the remote backend, and --eval-only must reproduce the saved grids'
    quality from nothing but artifacts."""
    import numpy as np

    from tpu3d.cli import main

    art = str(tmp_path / "artifacts")
    common = [
        "--images", DATASET, "--artifacts", art,
        "--downscale", "4", "--limit", "6",
        "--max-keypoints", "512", "--max-tracks", "20000",
        "--ransac-hypotheses", "128", "--quiet",
    ]
    main(["extract", *common])
    main(["reconstruct", *common])
    dense = ["--ray-stride", "8", "--grid-resolution", "32",
             "--holdout-every", "5"]
    main(["densify", *common, *dense, "--epochs", "1",
          "--no-checkpoint", "--final-grid"])
    assert os.path.exists(os.path.join(art, "dense_grid.npz"))
    main(["densify", *common, *dense, "--detail-only",
          "--detail-epochs", "1", "--no-checkpoint", "--final-grid"])
    assert os.path.exists(os.path.join(art, "dense_grid_detail.npz"))
    main(["densify", *common, *dense, "--eval-only"])
    out = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out[-1])
    assert stats["eval_only"] and stats["cascade"]
    assert np.isfinite(stats["test_psnr"])
    saved = json.load(open(os.path.join(art, "dense_result.json")))
    assert saved["test_psnr"] == stats["test_psnr"]


@pytest.mark.skipif(not os.path.isdir(DATASET), reason="dataset not available")
def test_cli_full_one_process(tmp_path, capsys):
    """cli full (the e2e one-process headline path) persists the staged
    artifact set so densify/export can consume it."""
    from tpu3d.cli import main

    art = str(tmp_path / "artifacts")
    main([
        "full", "--images", DATASET, "--artifacts", art,
        "--downscale", "4", "--limit", "5",
        "--max-keypoints", "512", "--max-tracks", "20000",
        "--ransac-hypotheses", "128", "--quiet",
        "--ply", str(tmp_path / "out.ply"),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out[-1])
    assert stats["registered"] >= 3
    assert "extract" in stats["stage_seconds"]
    assert "extract_timers" in stats
    assert os.path.exists(os.path.join(art, "reconstruction.npz"))
    assert os.path.exists(os.path.join(art, "reconstruction_meta.json"))
    assert os.path.exists(os.path.join(art, "features_meta.json"))
    assert os.path.exists(str(tmp_path / "out.ply"))
