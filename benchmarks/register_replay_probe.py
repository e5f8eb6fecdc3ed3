"""Replay dumped register steps on the current backend and diff the gates.

A live CPU-vs-TPU reconstruction comparison is useless past the first
flipped accept/reject decision — the chain is sequential and the two runs
stop seeing the same inputs. This probe replays the EXACT device inputs of
every fused PnP+triangulation step recorded by a reference run (engine's
TPU3D_DUMP_REGISTER hook) and reports, per call, how far the current
backend's PnP inlier count / pose / triangulation gates drift from the
recorded ones — isolating per-call backend divergence from cascade effects.

Usage:
  # 1. record on CPU:
  TPU3D_DUMP_REGISTER=artifacts/full290/regdump python -m tpu3d.cli \
      reconstruct --images ... --artifacts artifacts/full290 --from-matches --cpu
  # 2. replay on TPU (or CPU as a sanity check):
  python benchmarks/register_replay_probe.py --dump-dir artifacts/full290/regdump
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump-dir", default="artifacts/full290/regdump")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--both", action="store_true",
                    help="run each record on BOTH the default backend and the "
                         "in-process CPU backend and diff them directly "
                         "(ignores the recorded outputs — measures the "
                         "CURRENT code's backend divergence)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.core import lie
    from tpu3d.sfm.engine import _register_step

    files = sorted(glob.glob(os.path.join(args.dump_dir, "reg_*.npz")))
    if not files:
        print(f"no dumps under {args.dump_dir} — record with TPU3D_DUMP_REGISTER first",
              file=sys.stderr)
        sys.exit(1)
    if args.limit:
        files = files[: args.limit]

    backend = jax.default_backend()
    cpu_dev = None
    if args.both:
        cpu_dev = jax.local_devices(backend="cpu")[0]
        backend = f"{backend}-vs-cpu"
    print(f"replaying {len(files)} register steps on backend={backend}")

    def run_step(z, device=None):
        def put(a):
            a = jnp.asarray(a)
            return jax.device_put(a, device) if device is not None else a
        return _register_step(
            put(z["key"]), put(z["Xk"]), put(z["uvk"]), put(z["wk"]),
            float(z["pnp_thr"]), put(z["tri0"]), put(z["tri1"]), put(z["tri2"]),
            float(z["focal"]), float(z["tri_thr_px"]),
            num_hypotheses=int(z["nhyp"]),
        )

    records = []
    n_cnt_flips = 0     # PnP accept-gate flips at the engine's min_pnp_inliers
    n_big_cnt = 0       # |cnt diff| > 10% of recorded
    n_pose_div = 0      # rotation diff > 1 deg on accepted poses
    for fi, path in enumerate(files):
        z = np.load(path)
        cam, cnt, X_all, good_all = run_step(z)
        cam = np.asarray(cam)
        cnt = int(cnt)
        good = np.asarray(good_all).sum(axis=-1)
        if cpu_dev is not None:
            ccam, ccnt, _, cgood = run_step(z, device=cpu_dev)
            ref_cnt = int(ccnt)
            ref_cam = np.asarray(ccam)
            ref_good = np.asarray(cgood).sum(axis=-1)
        else:
            ref_cnt = int(z["cnt"])
            ref_cam = np.asarray(z["cam"])
            ref_good = np.asarray(z["good_per_edge"])
        # rotation geodesic distance between recorded and replayed pose
        R0 = lie.so3_exp_np(ref_cam[:3])
        R1 = lie.so3_exp_np(cam[:3])
        cosang = (np.trace(R0.T @ R1) - 1.0) / 2.0
        ang_deg = float(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
        t_diff = float(np.linalg.norm(ref_cam[3:] - cam[3:]))
        rec = {"i": fi, "img": int(z["img"]), "cnt": cnt, "ref_cnt": ref_cnt,
               "ang_deg": round(ang_deg, 4), "t_diff": round(t_diff, 5),
               "good": good.tolist(), "ref_good": ref_good.tolist()}
        records.append(rec)
        MIN_INL = 10  # SfMConfig.min_pnp_inliers default
        if (cnt > MIN_INL) != (ref_cnt > MIN_INL):
            n_cnt_flips += 1
            print(f"  GATE FLIP img={rec['img']}: cnt {ref_cnt} -> {cnt}")
        if abs(cnt - ref_cnt) > max(10, 0.1 * max(ref_cnt, 1)):
            n_big_cnt += 1
        if ref_cnt > MIN_INL and cnt > MIN_INL and ang_deg > 1.0:
            n_pose_div += 1
            print(f"  POSE DIV img={rec['img']}: ang {ang_deg:.2f} deg "
                  f"(cnt {ref_cnt} -> {cnt})")
        if fi % 50 == 0:
            print(f"  [{fi}/{len(files)}] img={rec['img']} cnt {ref_cnt}->{cnt} "
                  f"ang {ang_deg:.3f} deg", flush=True)

    cnts = np.array([r["cnt"] for r in records], np.float64)
    refs = np.array([r["ref_cnt"] for r in records], np.float64)
    angs = np.array([r["ang_deg"] for r in records])
    rel = np.abs(cnts - refs) / np.maximum(refs, 1.0)
    summary = {
        "backend": backend, "n": len(records),
        "gate_flips": n_cnt_flips, "big_cnt_diffs": n_big_cnt,
        "pose_div_1deg": n_pose_div,
        "cnt_rel_diff_mean": float(rel.mean()),
        "cnt_rel_diff_p95": float(np.percentile(rel, 95)),
        "ang_deg_median": float(np.median(angs)),
        "ang_deg_p95": float(np.percentile(angs, 95)),
        "ang_deg_max": float(angs.max()),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "records": records}, f)


if __name__ == "__main__":
    main()
