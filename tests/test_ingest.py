"""One-command checkpoint->npz ingest round trip (`tpu3d ingest`).

The reference's production front-end is DISK + LightGlue whose published
checkpoints can't be downloaded here (feature_extraction.py:28,
matching.py:122); the supported drop-in path is: obtain the .pth anywhere,
run `tpu3d ingest`, point the pipeline at the resulting .npz. These tests
prove the full path with randomly initialized torch checkpoints: torch
.pth -> cli ingest -> .npz -> runtime load -> tree/numerics identical to
direct conversion.
"""
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def _run_cli(argv, capsys):
    from tpu3d.cli import main

    main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, va in la:
        np.testing.assert_array_equal(np.asarray(va), np.asarray(lb[path]),
                                      err_msg=str(path))


def test_ingest_disk_checkpoint_roundtrip(tmp_path, capsys):
    """DiskUNet params -> kornia-named torch checkpoint -> ingest -> npz
    must reproduce the source tree exactly."""
    from tpu3d.features.disk import DiskUNet
    from tpu3d.features.learned import load_params_npz

    params = DiskUNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    p = jax.tree_util.tree_map(np.asarray, params)["params"]

    # Inverse of convert_kornia_state_dict's mapping: flax HWIO -> torch
    # OIHW under the kornia >= 0.7 thin-unet naming.
    sd = {}

    def put(prefix, blk, gated=True):
        sd[prefix + ".conv.weight" if gated else prefix + ".weight"] = (
            torch.tensor(np.transpose(blk["conv"]["kernel"] if gated
                                      else blk["kernel"], (3, 2, 0, 1))))
        sd[prefix + ".conv.bias" if gated else prefix + ".bias"] = (
            torch.tensor(blk["conv"]["bias"] if gated else blk["bias"]))
        if gated:
            sd[prefix + ".gate.weight"] = torch.tensor(blk["prelu_alpha"])

    for i in range(5):
        put(f"unet.path_down.{i}.1", p[f"down_{i}"])
    for i in range(3):
        put(f"unet.path_up.{i}.1", p[f"up_{i}"])
    put("unet.path_up.3.1.conv", p["up_3_conv"], gated=False)

    ckpt = str(tmp_path / "disk.pth")
    torch.save(sd, ckpt)
    out = _run_cli(["ingest", "--frontend", "disk",
                    "--frontend-weights", ckpt,
                    "--out", str(tmp_path / "disk.npz")], capsys)
    assert out["model"] == "disk" and out["out"].endswith("disk.npz")
    back = load_params_npz(out["out"])
    _tree_equal(params, back)


def test_ingest_lightglue_checkpoint_matches_direct_conversion(tmp_path, capsys):
    """Reference torch LightGlue state_dict -> ingest -> npz must equal
    convert_torch_state_dict applied directly (same tree, same arrays)."""
    ref_lg = os.path.join("/root/reference", "lightglue", "lightglue.py")
    if not os.path.isfile(ref_lg):
        pytest.skip("reference not mounted")
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_lightglue", ref_lg)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    torch.manual_seed(0)
    tm = ref_mod.LightGlue(features=None, input_dim=128, n_layers=9,
                           flash=False, depth_confidence=-1,
                           width_confidence=-1, weights=None).eval()
    ckpt = str(tmp_path / "lg.pth")
    torch.save(tm.state_dict(), ckpt)

    out = _run_cli(["ingest", "--matcher", "lightglue",
                    "--matcher-weights", ckpt,
                    "--out", str(tmp_path / "lg.npz")], capsys)
    assert out["model"] == "lightglue"

    from tpu3d.features.learned import load_params_npz
    from tpu3d.matching.lightglue import convert_torch_state_dict

    direct = convert_torch_state_dict(tm.state_dict(), n_layers=9)
    back = load_params_npz(out["out"])
    _tree_equal(direct, back)


def test_ingest_requires_exactly_one_checkpoint(capsys):
    from tpu3d.cli import main

    with pytest.raises(SystemExit):
        main(["ingest"])
    with pytest.raises(SystemExit):
        main(["ingest", "--frontend-weights", "a.pth",
              "--matcher-weights", "b.pth"])
