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
