"""Multi-host data-parallel extraction: two jax.distributed processes each
extract an image shard; process 0 merges shards into the canonical
features artifact. The merged result must equal a single-process
extraction bit-for-bit (the classical extractor is per-image
deterministic)."""
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
    base = ((base.astype(np.float32) + np.roll(base, 2, 0) + np.roll(base, 2, 1)) / 3).astype(np.uint8)
    for i in range(6):
        crop = base[i * 2 : i * 2 + 96, i * 3 : i * 3 + 128]
        Image.fromarray(crop).save(os.path.join(str(d), f"im{i:02d}.png"))
    return str(d)


def _run_extract(img_dir, artifacts, extra_env=None, timeout=240):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env.update(extra_env or {})
    return subprocess.Popen(
        [sys.executable, "-m", "tpu3d.cli", "extract", "--images", img_dir,
         "--artifacts", artifacts, "--max-keypoints", "64", "--quiet"],
        env=env, cwd=root, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


@pytest.mark.timeout(420)
def test_two_process_extraction_matches_single(tiny_images, tmp_path):
    single = str(tmp_path / "single")
    p = _run_extract(tiny_images, single)
    out, _ = p.communicate(timeout=240)
    assert p.returncode == 0, out

    port = _free_port()
    multi = str(tmp_path / "multi")
    workers = []
    for pid in range(2):
        workers.append(_run_extract(tiny_images, multi, extra_env={
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
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # shards were cleaned up after the merge
    assert not [f for f in os.listdir(multi) if "shard" in f]
