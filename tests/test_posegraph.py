import numpy as np
import jax.numpy as jnp

from tpu3d.core import lie
from tpu3d.sfm.posegraph import (
    average_rotations, average_translations, largest_component, pose_graph_init,
)


def make_graph(rng, n=12, extra_edges=10, rot_noise=0.01, t_noise=0.01):
    """Random camera ring with chordal extra edges + noisy relative poses."""
    Rs = [lie.so3_exp_np(rng.normal(0, 0.4, 3).astype(np.float32)) for _ in range(n)]
    Cs = [rng.normal(0, 2.0, 3) for _ in range(n)]
    edges = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(extra_edges):
        i, j = rng.choice(n, 2, replace=False)
        edges.append((int(i), int(j)))
    rel_R, rel_t = [], []
    for i, j in edges:
        Rij = Rs[j] @ Rs[i].T
        Rij = lie.so3_exp_np(rng.normal(0, rot_noise, 3).astype(np.float32)) @ Rij
        # world->cam translations: t = -R C; rel t = t_j - Rij t_i
        ti = -Rs[i] @ Cs[i]
        tj = -Rs[j] @ Cs[j]
        tij = tj - Rij @ ti
        tij = tij / np.linalg.norm(tij)
        tij = tij + rng.normal(0, t_noise, 3)
        rel_R.append(Rij)
        rel_t.append(tij.astype(np.float64))
    return Rs, Cs, edges, rel_R, rel_t


def test_largest_component():
    mask = largest_component(6, [(0, 1), (1, 2), (4, 5)])
    assert mask.tolist() == [True, True, True, False, False, False]


def test_rotation_averaging_exact(rng):
    Rs, Cs, edges, rel_R, rel_t = make_graph(rng, rot_noise=0.0)
    R_est = average_rotations(12, edges, rel_R)
    # Gauge is RIGHT-multiplicative (M_i = R_i G): align with
    # G = R_est[0]^T Rs[0] applied on the right.
    A = R_est[0].T @ Rs[0]
    for i in range(12):
        np.testing.assert_allclose(R_est[i] @ A, Rs[i], atol=1e-4)


def test_rotation_averaging_noisy(rng):
    Rs, Cs, edges, rel_R, rel_t = make_graph(rng, rot_noise=0.02)
    R_est = average_rotations(12, edges, rel_R)
    A = R_est[0].T @ Rs[0]
    errs = []
    for i in range(12):
        dR = (R_est[i] @ A) @ Rs[i].T
        errs.append(np.linalg.norm(lie.so3_log_np(dR)))
    assert np.mean(errs) < 0.05


def test_translation_averaging(rng):
    Rs, Cs, edges, rel_R, rel_t = make_graph(rng, rot_noise=0.0, t_noise=0.0)
    C_est = average_translations(12, edges, rel_t, np.stack(Rs))
    # similarity-align (no rotation needed since R fixed; scale+shift)
    C_gt = np.stack(Cs)
    C0 = C_est - C_est.mean(0)
    G0 = C_gt - C_gt.mean(0)
    s = np.sum(C0 * G0) / np.sum(C0 * C0)
    err = np.linalg.norm(s * C0 - G0, axis=1).mean()
    spread = np.linalg.norm(G0, axis=1).mean()
    assert err < 0.02 * spread


def test_pose_graph_init_end_to_end(rng):
    Rs, Cs, edges, rel_R, rel_t = make_graph(rng, rot_noise=0.01, t_noise=0.01)
    cams, has_cam, mask = pose_graph_init(12, edges, rel_R, rel_t)
    assert has_cam.all()
    # reprojection-style check: relative rotations reproduced
    for (i, j), Rij in list(zip(edges, rel_R))[:12]:
        Ri = lie.so3_exp_np(cams[i, :3])
        Rj = lie.so3_exp_np(cams[j, :3])
        dR = (Rj @ Ri.T) @ Rij.T
        assert np.linalg.norm(lie.so3_log_np(dR)) < 0.08


def test_averaging_survives_outlier_edges(rng):
    """15% gross outlier edges (random R, random t direction) must not
    corrupt the solution — the IRLS reweighting in both averagers is what
    makes pose-graph init usable on real match graphs."""
    Rs, Cs, edges, rel_R, rel_t = make_graph(rng, n=16, extra_edges=24,
                                             rot_noise=0.005, t_noise=0.005)
    n_out = max(len(edges) * 15 // 100, 1)
    out_idx = rng.choice(len(edges), n_out, replace=False)
    for k in out_idx:
        rel_R[k] = lie.so3_exp_np(rng.normal(0, 2.0, 3).astype(np.float32))
        d = rng.normal(0, 1, 3)
        rel_t[k] = d / np.linalg.norm(d)

    R_est = average_rotations(16, edges, rel_R)
    out_set = set(out_idx.tolist())
    errs = []
    for e, (i, j) in enumerate(edges):
        if e in out_set:
            continue
        dR = (R_est[j] @ R_est[i].T) @ (Rs[j] @ Rs[i].T).T
        errs.append(np.linalg.norm(lie.so3_log_np(dR)))
    assert np.median(errs) < 0.05

    C_est = average_translations(16, edges, rel_t, np.stack(Rs))
    C_gt = np.stack(Cs)
    C0 = C_est - C_est.mean(0)
    G0 = C_gt - C_gt.mean(0)
    s = np.sum(C0 * G0) / np.sum(C0 * C0)
    err = np.linalg.norm(s * C0 - G0, axis=1).mean()
    spread = np.linalg.norm(G0, axis=1).mean()
    assert err < 0.12 * spread, f"err/spread = {err/spread:.3f}"
