"""The last-chance matching rescue: an image whose only direct view-graph
neighbor is still unvisited when the retry pass scans it must register in
the final rescue pass (pipeline.run_matching), not stay stranded."""
import os

import pytest

DATASET = "/root/reference/ystad_kloster"


@pytest.mark.skipif(not os.path.isdir(DATASET), reason="dataset not available")
def test_rescue_reaches_stranded_image():
    from tpu3d.config import (
        CameraConfig, FrontendConfig, MatchingConfig, PipelineConfig,
        RansacConfig, SfMConfig,
    )
    from tpu3d.io.images import list_images
    from tpu3d.sfm import pipeline as P

    ds = 4
    focal = 2378.98305085 / ds
    cfg = PipelineConfig(
        camera=CameraConfig(focal_length=focal),
        frontend=FrontendConfig(max_keypoints=1024, batch_size=3),
        matching=MatchingConfig(min_raw_matches=50, pair_batch=8),
        sfm=SfMConfig(
            camera=CameraConfig(focal_length=focal),
            max_tracks=50_000,
            ransac=RansacConfig(num_hypotheses=256),
        ),
    )
    names = list_images(DATASET)[:6]
    feats = P.run_extraction(DATASET, cfg, names=names, downscale=ds,
                             verbose=False)
    # Handcrafted topology (frames are sequential, so any pair genuinely
    # matches — only the GRAPH strands image 4):
    #   BFS covers the 0-1-2-3 chain.
    #   adj[4] = [5]: 4's only neighbor is 5, which is unvisited when the
    #     ascending retry pass scans vtx=4 -> 4 stays missing after retry.
    #   adj[5] = [4, 3]: 5 registers in the retry pass via visited 3.
    # The rescue pass must then recover 4 through the now-visited 5.
    adj = {
        0: [1], 1: [0, 2], 2: [1, 3], 3: [2, 1],
        4: [5], 5: [4, 3],
    }
    regs, _ts = P.run_matching(feats, adj, cfg, verbose=False)
    reached = {r.img for r in regs} | {regs[0].edges[0].ref_img}
    assert P.LAST_MATCH_TIMERS["unmatched"] == []
    assert 4 in reached and 5 in reached
