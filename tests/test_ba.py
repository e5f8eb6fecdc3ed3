import numpy as np
import jax.numpy as jnp

from tpu3d.ba import bundle_adjust, ba_cost
from tpu3d.core import lie


def make_ba_problem(rng, n_cams=6, n_pts=300, noise_px=0.3, focal=1000.0,
                    perturb_cam=0.02, perturb_pt=0.05, pad_obs=0):
    X = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-2, 2, n_pts),
                  rng.uniform(5, 9, n_pts)], -1).astype(np.float32)
    cams = []
    for c in range(n_cams):
        w = rng.normal(0, 0.05, 3).astype(np.float32)
        t = np.array([0.4 * c - 0.8, 0.02 * c, 0.01 * c], np.float32)
        cams.append(np.concatenate([w, t]))
    cams = np.stack(cams)

    cam_idx, pt_idx, uvs = [], [], []
    for c in range(n_cams):
        R = np.asarray(lie.so3_exp(jnp.asarray(cams[c, :3])))
        Xc = X @ R.T + cams[c, 3:]
        uv = Xc[:, :2] / Xc[:, 2:3] + rng.normal(0, noise_px / focal, (n_pts, 2))
        cam_idx.append(np.full(n_pts, c))
        pt_idx.append(np.arange(n_pts))
        uvs.append(uv)
    cam_idx = np.concatenate(cam_idx).astype(np.int32)
    pt_idx = np.concatenate(pt_idx).astype(np.int32)
    uv = np.concatenate(uvs).astype(np.float32)
    w = np.ones(len(uv), np.float32)
    if pad_obs:
        cam_idx = np.concatenate([cam_idx, np.zeros(pad_obs, np.int32)])
        pt_idx = np.concatenate([pt_idx, np.zeros(pad_obs, np.int32)])
        uv = np.concatenate([uv, np.full((pad_obs, 2), 77.0, np.float32)])
        w = np.concatenate([w, np.zeros(pad_obs, np.float32)])

    cams_noisy = cams.copy()
    cams_noisy[1:] += rng.normal(0, perturb_cam, cams_noisy[1:].shape).astype(np.float32)
    X_noisy = (X + rng.normal(0, perturb_pt, X.shape)).astype(np.float32)
    cam_fixed = np.zeros(n_cams, np.float32)
    cam_fixed[0] = 1.0
    return dict(
        cams_gt=cams, X_gt=X, cams0=cams_noisy, X0=X_noisy,
        cam_idx=cam_idx, pt_idx=pt_idx, uv=uv, w=w, cam_fixed=cam_fixed,
        focal=focal, noise_px=noise_px,
    )


def test_ba_converges(rng):
    p = make_ba_problem(rng)
    c0 = float(ba_cost(jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
                       p["cam_idx"], p["pt_idx"], p["uv"], p["w"]))
    st = bundle_adjust(
        jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
        jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
        jnp.asarray(p["uv"]), jnp.asarray(p["w"]), jnp.asarray(p["cam_fixed"]),
        max_iters=15,
    )
    n_obs = int(np.sum(p["w"]))
    rms_px = np.sqrt(float(st.cost) / n_obs) * p["focal"]
    assert float(st.cost) < c0 * 1e-2
    # should reach the noise floor (~noise_px)
    assert rms_px < 2.5 * p["noise_px"]


def test_ba_recovers_poses(rng):
    p = make_ba_problem(rng, noise_px=0.0)
    st = bundle_adjust(
        jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
        jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
        jnp.asarray(p["uv"]), jnp.asarray(p["w"]), jnp.asarray(p["cam_fixed"]),
        max_iters=20,
    )
    np.testing.assert_allclose(np.asarray(st.cams), p["cams_gt"], atol=2e-3)


def test_ba_fixed_camera_stays(rng):
    p = make_ba_problem(rng)
    st = bundle_adjust(
        jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
        jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
        jnp.asarray(p["uv"]), jnp.asarray(p["w"]), jnp.asarray(p["cam_fixed"]),
        max_iters=5,
    )
    np.testing.assert_allclose(np.asarray(st.cams)[0], p["cams0"][0], atol=0)


def test_ba_padded_obs_invariant(rng):
    p1 = make_ba_problem(rng)
    rng2 = np.random.default_rng(42)
    p2 = make_ba_problem(rng2, pad_obs=512)
    st1 = bundle_adjust(
        jnp.asarray(p1["cams0"]), jnp.asarray(p1["X0"]),
        jnp.asarray(p1["cam_idx"]), jnp.asarray(p1["pt_idx"]),
        jnp.asarray(p1["uv"]), jnp.asarray(p1["w"]), jnp.asarray(p1["cam_fixed"]),
        max_iters=5,
    )
    st2 = bundle_adjust(
        jnp.asarray(p2["cams0"]), jnp.asarray(p2["X0"]),
        jnp.asarray(p2["cam_idx"]), jnp.asarray(p2["pt_idx"]),
        jnp.asarray(p2["uv"]), jnp.asarray(p2["w"]), jnp.asarray(p2["cam_fixed"]),
        max_iters=5,
    )
    np.testing.assert_allclose(np.asarray(st1.cams), np.asarray(st2.cams), atol=1e-4)


def test_ba_huber_resists_outliers(rng):
    """With gross outlier observations, Huber BA recovers poses far better
    than plain L2."""
    p = make_ba_problem(rng, noise_px=0.2)
    uv = p["uv"].copy()
    n_out = len(uv) // 10
    rng2 = np.random.default_rng(7)
    idx = rng2.choice(len(uv), n_out, replace=False)
    # gross outliers: 30-80 px at f=1000, random direction
    mag = rng2.uniform(0.03, 0.08, (n_out, 1))
    ang = rng2.uniform(0, 2 * np.pi, n_out)
    uv[idx] += mag * np.stack([np.cos(ang), np.sin(ang)], -1)

    def run(robust):
        st = bundle_adjust(
            jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
            jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
            jnp.asarray(uv), jnp.asarray(p["w"]), jnp.asarray(p["cam_fixed"]),
            max_iters=15, robust_delta=robust,
        )
        return np.abs(np.asarray(st.cams) - p["cams_gt"]).max()

    err_l2 = run(None)
    err_huber = run(3.0 / p["focal"])
    assert err_huber < err_l2 * 0.5
    # Huber is not redescending, so some outlier influence remains; the
    # bound also absorbs scale-gauge wander (only cam0 is fixed, so a
    # 1-DOF scale direction is cost-flat and the CG forcing tolerance
    # stops inside it — raw pose error is not fully gauge-invariant).
    assert err_huber < 0.03


def test_ba_monotonic_cost(rng):
    """Metamorphic: LM with accept/reject never increases cost with iters."""
    p = make_ba_problem(rng)
    costs = []
    for iters in (1, 3, 6, 10):
        st = bundle_adjust(
            jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
            jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
            jnp.asarray(p["uv"]), jnp.asarray(p["w"]), jnp.asarray(p["cam_fixed"]),
            max_iters=iters,
        )
        costs.append(float(st.cost))
    assert all(b <= a + 1e-6 for a, b in zip(costs, costs[1:]))


def test_observation_jacobians_match_jacfwd(rng):
    """Closed-form per-camera Jacobian factorization == vmapped jacfwd."""
    from tpu3d.ba.residuals import (
        _observation_jacobians_jacfwd, observation_jacobians,
    )

    C, P, O = 7, 40, 200
    cams = rng.normal(0, 0.5, (C, 6)).astype(np.float32)
    pts = rng.normal(0, 1, (P, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    ci = rng.integers(0, C, O).astype(np.int32)
    pi = rng.integers(0, P, O).astype(np.int32)
    uv = rng.normal(0, 0.2, (O, 2)).astype(np.float32)
    w = (rng.uniform(size=O) > 0.2).astype(np.float32)
    args = (jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci),
            jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w))
    r1, Jc1, Jp1 = observation_jacobians(*args)
    r2, Jc2, Jp2 = _observation_jacobians_jacfwd(*args)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Jc1), np.asarray(Jc2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Jp1), np.asarray(Jp2), rtol=1e-4, atol=1e-5)


def test_ba_block_reuse_equivalent(rng):
    """reuse_blocks=True (lax.cond rebuild only after accepted steps) must
    be numerically identical to the always-rebuild path: a rejected step
    leaves (cams, points) unchanged, so the cached blocks are exact."""
    p = make_ba_problem(rng, perturb_cam=0.08, perturb_pt=0.15)
    args = (jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
            jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
            jnp.asarray(p["uv"]), jnp.asarray(p["w"]),
            jnp.asarray(p["cam_fixed"]))
    a = bundle_adjust(*args, max_iters=12, reuse_blocks=True)
    b = bundle_adjust(*args, max_iters=12, reuse_blocks=False)
    assert int(a.n_iters) == int(b.n_iters)
    np.testing.assert_allclose(np.asarray(a.cams), np.asarray(b.cams), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.points), np.asarray(b.points), atol=1e-6)
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-6)


def test_refine_focal_recovers_true_focal(rng):
    """Shared-focal coordinate descent (ba/focal.py — the working
    counterpart of the reference's dead intrinsic-refinement path,
    sfm.py:42-45,93-99): start from a 25%-wrong focal and noisy geometry,
    recover the true focal to <1%."""
    import jax.numpy as jnp
    from tests.conftest import synthetic_scene
    from tpu3d.ba.focal import refine_focal
    from tpu3d.core import lie as tlie

    sc = synthetic_scene(rng, n_points=120, n_cams=5, focal=1000.0)
    n_cams, n_pts = sc["R"].shape[0], sc["X"].shape[0]
    cams0 = np.stack([
        np.concatenate([tlie.so3_log_np(sc["R"][c]), sc["t"][c]])
        for c in range(n_cams)
    ]).astype(np.float32)
    # perturb the free cameras + points a little (focal-BA must cope)
    cams0[1:] += rng.normal(0, 0.005, cams0[1:].shape).astype(np.float32)
    X0 = sc["X"] + rng.normal(0, 0.01, sc["X"].shape).astype(np.float32)
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv_px = sc["uv"].reshape(-1, 2).astype(np.float32)
    w = np.ones(len(cam_idx), np.float32)
    cam_fixed = np.zeros(n_cams, np.float32)
    cam_fixed[0] = 1.0
    f, st = refine_focal(
        jnp.asarray(cams0), jnp.asarray(X0), jnp.asarray(cam_idx),
        jnp.asarray(pt_idx), jnp.asarray(uv_px), jnp.asarray(w),
        jnp.asarray(cam_fixed), focal0=750.0)
    assert abs(f - 1000.0) / 1000.0 < 0.01, f
    assert float(st.cost) < 1e-4
