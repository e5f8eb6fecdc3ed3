"""Cross-host STAGE overlap (dist/overlap.py): two jax.distributed
processes extract shards while process 0 concurrently prematches
sequential-prior edges from published batches. The merged features must
equal single-process extraction bit-for-bit, the prematch memo must cover
the sequential edges, and a follow-up match command must consume it."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def tiny_images(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("imgs")
    base = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    base = ((base.astype(np.float32) + np.roll(base, 2, 0)
             + np.roll(base, 2, 1)) / 3).astype(np.uint8)
    for i in range(6):
        crop = base[i * 2 : i * 2 + 96, i * 3 : i * 3 + 128]
        Image.fromarray(crop).save(os.path.join(str(d), f"im{i:02d}.png"))
    return str(d)


def _run_cli(cmd, img_dir, artifacts, extra_args=(), extra_env=None,
             timeout=240):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env.update(extra_env or {})
    return subprocess.Popen(
        [sys.executable, "-m", "tpu3d.cli", cmd, "--images", img_dir,
         "--artifacts", artifacts, "--max-keypoints", "64", "--quiet",
         *extra_args],
        env=env, cwd=root, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


@pytest.mark.timeout(420)
def test_stage_overlap_extraction_and_prematch(tiny_images, tmp_path):
    single = str(tmp_path / "single")
    p = _run_cli("extract", tiny_images, single)
    out, _ = p.communicate(timeout=240)
    assert p.returncode == 0, out

    port = _free_port()
    multi = str(tmp_path / "multi")
    workers = []
    for pid in range(2):
        workers.append(_run_cli("extract", tiny_images, multi,
                                extra_args=["--overlap"],
                                extra_env={
            "TPU3D_COORDINATOR": f"127.0.0.1:{port}",
            "TPU3D_NUM_PROCESSES": "2",
            "TPU3D_PROCESS_ID": str(pid),
            "TPU3D_LOCAL_DEVICES": "1",
        }))
    outs = [w.communicate(timeout=300)[0] for w in workers]
    for pid, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {pid}:\n{out}"

    a = np.load(os.path.join(single, "features.npz"))
    b = np.load(os.path.join(multi, "features.npz"))
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # Prematch memo: published, and covers the cross-shard sequential
    # edges (offsets 1-3 over 6 images => all (i, j<=i+3) pairs).
    pm = np.load(os.path.join(multi, "prematch.npz"))
    edges = {tuple(e) for e in pm["edges"]}
    expected = {(i, j) for i in range(6) for j in range(i + 1, min(i + 4, 6))}
    assert edges == expected
    assert pm["flat"].shape[0] == len(expected)
    # batch files were cleaned up (the done marker may remain)
    fb = os.path.join(multi, "fbatches")
    if os.path.isdir(fb):
        assert not [f for f in os.listdir(fb) if f.startswith("fbatch_")]

    # A follow-up match run consumes the memo without error.
    p = _run_cli("match", tiny_images, multi)
    out, _ = p.communicate(timeout=240)
    assert p.returncode == 0, out
    assert os.path.exists(os.path.join(multi, "matches.npz"))
