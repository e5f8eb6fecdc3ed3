"""Golden end-to-end pipeline test on a small real ystad_kloster subset
(SURVEY §4 test-strategy item c). Runs the full extract → retrieve → match
→ reconstruct chain on 6 sequential frames at 1/4 resolution, CPU."""
import os

import numpy as np
import pytest

DATASET = "/root/reference/ystad_kloster"


@pytest.mark.skipif(not os.path.isdir(DATASET), reason="dataset not available")
def test_pipeline_on_ystad_subset(tmp_path):
    from tpu3d.config import (
        CameraConfig,
        FrontendConfig,
        MatchingConfig,
        PipelineConfig,
        RansacConfig,
        SfMConfig,
    )
    from tpu3d.io.images import list_images
    from tpu3d.io.ply import write_ply
    from tpu3d.sfm import pipeline as P

    ds = 4
    focal = 2378.98305085 / ds
    cfg = PipelineConfig(
        camera=CameraConfig(focal_length=focal),
        frontend=FrontendConfig(max_keypoints=1024, batch_size=3),
        matching=MatchingConfig(min_raw_matches=50),
        sfm=SfMConfig(
            camera=CameraConfig(focal_length=focal),
            max_tracks=50_000,
            ransac=RansacConfig(num_hypotheses=256),
            global_ba_every=4,
        ),
    )
    names = list_images(DATASET)[:6]
    rec, timings = P.reconstruct(DATASET, cfg, names=names, downscale=ds, verbose=False)

    assert len(rec.registered) >= 4, f"registered only {len(rec.registered)}"
    assert len(rec.points) > 150
    assert rec.mean_reproj_px < 1.0, f"mean reproj {rec.mean_reproj_px}"

    # PLY export roundtrip (stage 5 / L5).
    out = tmp_path / "result.ply"
    n = write_ply(str(out), rec.points, rec.colors_bgr)
    assert n > 100
    head = out.read_text().splitlines()[:3]
    assert head[0] == "ply"
