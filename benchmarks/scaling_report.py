"""Multi-device scaling report on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment (one TPU
chip via a tunnel), so this report provides the honest, hardware-
independent scaling evidence instead:

1. SPMD equivalence — the sharded dense train step and the observation-
   sharded global BA produce the same numbers at N = 1, 2, 4, 8 devices
   (the sharding annotations change the schedule, never the math).
2. Communication structure — collective ops and bytes moved per step,
   extracted from the compiled HLO at each N. This is the quantity that
   determines ICI scaling on a real slice: per-step collective bytes
   that stay flat (or shrink per-device) as N grows mean the program is
   compute-bound and scales; bytes that grow with N mean it won't.

Each device count runs in a subprocess (the XLA host-platform device
count is fixed at backend init). Wall-clock on the 2-core host is NOT
reported as scaling evidence — virtual devices time-slice two cores.

Usage: python benchmarks/scaling_report.py [--out benchmarks/scaling_report.json]
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


def _hlo_collective_stats(hlo_text: str):
    """Count collective ops and sum their output bytes from HLO text."""
    stats = {name: {"count": 0, "bytes": 0} for name in COLLECTIVES}
    # lines like:  %all-reduce.5 = f32[28,64,64,64]{3,2,1,0} all-reduce(...)
    pat = re.compile(
        r"=\s*(?:\()?\s*([a-z0-9]+)\[([\d,]*)\][^=]*?\b(" + "|".join(COLLECTIVES) + r")\(")
    for m in pat.finditer(hlo_text):
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        stats[op]["count"] += 1
        stats[op]["bytes"] += n * _DTYPE_BYTES.get(dtype, 4)
    return {k: v for k, v in stats.items() if v["count"]}


def child(n_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tpu3d.config import DenseConfig, MeshConfig
    from tpu3d.dense.grid import create_grid
    from tpu3d.dist.mesh import make_mesh
    from tpu3d.dist.sharding import make_sharded_dense_step, sharded_bundle_adjust

    report = {"n_devices": n_devices}
    devices = jax.devices()[:n_devices]
    mp = 2 if n_devices >= 2 else 1
    mesh = make_mesh(MeshConfig(data_parallel=n_devices // mp, model_parallel=mp),
                     devices)
    report["mesh"] = {"data": n_devices // mp, "model": mp}

    # ---- dense train step: rays DP x voxel-brick TP --------------------
    # Fixed GLOBAL problem size (strong scaling): identical math at every N.
    cfg = DenseConfig(grid_resolution=64, num_samples=64, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=4096)
    vg = create_grid(64, (-1, -1, -1), (1, 1, 1))
    opt = optax.adam(1e-2)
    rng = np.random.default_rng(0)
    o = rng.normal(0, 1, (cfg.batch_size, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    rgb = rng.uniform(0, 1, (cfg.batch_size, 3)).astype(np.float32)

    step, place = make_sharded_dense_step(cfg, opt, mesh)
    bounds = jnp.stack([vg.min_bound, vg.max_bound])
    garr, opt_state, batch = place(vg.grid, opt.init(vg.grid),
                                   jnp.asarray(o), jnp.asarray(d), jnp.asarray(rgb))
    key = jax.random.PRNGKey(0)
    lowered = step.lower(garr, bounds, opt_state, key, *batch)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    report["dense_step"] = {
        "global_batch": cfg.batch_size,
        "grid": f"{cfg.grid_resolution}^3 x 28",
        "collectives": _hlo_collective_stats(hlo),
    }
    ca = compiled.cost_analysis()
    if ca:
        ca0 = ca[0] if isinstance(ca, (list, tuple)) else ca
        report["dense_step"]["flops"] = float(ca0.get("flops", -1))
    new_grid, new_opt, loss = step(garr, bounds, opt_state, key, *batch)
    report["dense_step"]["loss"] = float(loss)
    report["dense_step"]["grid_checksum"] = float(jnp.sum(jnp.abs(new_grid)))

    # ---- global BA: observation-sharded Schur-CG LM ---------------------
    # Synthetic 64-camera ring looking at a 4096-point cloud.
    C, P, O = 64, 4096, 65536
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    cams = np.zeros((C, 6), np.float32)
    ang = np.linspace(0, 2 * np.pi, C, endpoint=False)
    cams[:, 1] = ang  # yaw around the cloud
    cams[:, 5] = 4.0
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    pt_idx = rng.integers(0, P, O).astype(np.int32)
    from tpu3d.ba.residuals import _project_one

    uv = np.array(jax.vmap(_project_one)(jnp.asarray(cams)[cam_idx],
                                         jnp.asarray(pts)[pt_idx]))
    uv += rng.normal(0, 1e-3, uv.shape).astype(np.float32)
    w = np.ones(O, np.float32)
    cam_fixed = np.zeros(C, np.float32)
    cam_fixed[0] = 1.0
    cams_noisy = cams + rng.normal(0, 1e-2, cams.shape).astype(np.float32)

    from tpu3d.ba.lm import bundle_adjust

    args = (jnp.asarray(cams_noisy), jnp.asarray(pts + rng.normal(0, 1e-2, pts.shape).astype(np.float32)),
            jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv),
            jnp.asarray(w), jnp.asarray(cam_fixed))
    # Lower the inner jitted solver on arrays ALREADY placed with the
    # observation sharding — lowering on uncommitted host arrays would let
    # the partitioner default everything to replicated and hide the
    # collectives this report exists to count.
    from tpu3d.ba.lm import bundle_adjust
    from tpu3d.dist.mesh import data_sharding, replicated

    obs1, obs2, rep_s = (data_sharding(mesh, 1), data_sharding(mesh, 2),
                         replicated(mesh))
    placed = (jax.device_put(args[0], rep_s), jax.device_put(args[1], rep_s),
              jax.device_put(args[2], obs1), jax.device_put(args[3], obs1),
              jax.device_put(args[4], obs2), jax.device_put(args[5], obs1),
              jax.device_put(args[6], rep_s))
    hlo_ba = bundle_adjust.lower(
        *placed, max_iters=10, cg_iters=16).compile().as_text()
    st = sharded_bundle_adjust(mesh, *args, max_iters=10, cg_iters=16)
    report["global_ba"] = {
        "problem": {"cams": C, "points": P, "obs": O},
        "collectives": _hlo_collective_stats(hlo_ba),
        "final_cost": float(st.cost),
        "cam_checksum": float(jnp.sum(jnp.abs(st.cams))),
    }
    print(json.dumps(report))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/scaling_report.json")
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()
    rows = []
    for n in args.devices:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, cwd=REPO, timeout=1800)
        if r.returncode != 0:
            print(r.stdout)
            print(r.stderr, file=sys.stderr)
            raise SystemExit(f"child N={n} failed")
        rows.append(json.loads(r.stdout.strip().splitlines()[-1]))
        print(f"N={n}: ok "
              f"(dense loss {rows[-1]['dense_step']['loss']:.6f}, "
              f"BA cost {rows[-1]['global_ba']['final_cost']:.6e})")

    # SPMD equivalence across N (the whole point of "annotate shardings,
    # let XLA insert collectives": the math is N-invariant).
    base = rows[0]
    checks = {"dense_loss_max_dev": 0.0, "dense_grid_checksum_rel_dev": 0.0,
              "ba_cost_rel_dev": 0.0, "ba_cam_checksum_rel_dev": 0.0}
    for r in rows[1:]:
        checks["dense_loss_max_dev"] = max(
            checks["dense_loss_max_dev"],
            abs(r["dense_step"]["loss"] - base["dense_step"]["loss"]))
        checks["dense_grid_checksum_rel_dev"] = max(
            checks["dense_grid_checksum_rel_dev"],
            abs(r["dense_step"]["grid_checksum"] - base["dense_step"]["grid_checksum"])
            / abs(base["dense_step"]["grid_checksum"]))
        checks["ba_cost_rel_dev"] = max(
            checks["ba_cost_rel_dev"],
            abs(r["global_ba"]["final_cost"] - base["global_ba"]["final_cost"])
            / abs(base["global_ba"]["final_cost"]))
        checks["ba_cam_checksum_rel_dev"] = max(
            checks["ba_cam_checksum_rel_dev"],
            abs(r["global_ba"]["cam_checksum"] - base["global_ba"]["cam_checksum"])
            / abs(base["global_ba"]["cam_checksum"]))
    out = {"rows": rows, "equivalence": checks,
           "note": ("virtual CPU devices; wall-clock intentionally omitted "
                    "(2-core host time-slices the mesh). Collective bytes/step "
                    "are the hardware-independent scaling quantity.")}
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(checks, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        sys.path.insert(0, REPO)
        child(int(sys.argv[2]))
    else:
        main()
