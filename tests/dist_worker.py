"""Worker process for the 2-process jax.distributed CPU test.

Each process brings TPU3D_LOCAL_DEVICES virtual CPU devices, joins the
process group through tpu3d.dist.maybe_initialize_distributed, builds the
GLOBAL mesh, and runs two real multi-process programs:

  1. a data-sharded global sum (each process contributes its local shard;
     the jitted reduction all-reduces across processes),
  2. a sharded_bundle_adjust step with the observation axis spanning both
     processes' devices.

Prints one "OK <checksum> <cost>" line; the parent test asserts both
processes print identical correct values.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu3d.dist import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "TPU3D_* env not set"
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_local = int(os.environ["TPU3D_LOCAL_DEVICES"])
    n_proc = int(os.environ["TPU3D_NUM_PROCESSES"])
    pid = int(os.environ["TPU3D_PROCESS_ID"])
    assert len(jax.local_devices()) == n_local
    assert len(jax.devices()) == n_local * n_proc, (
        f"global devices {len(jax.devices())} != {n_local * n_proc}")
    assert jax.process_index() == pid

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    # 1. global data-sharded sum: global array [0, 1, ..., G*8-1]
    G = n_local * n_proc
    per_dev = 8
    global_shape = (G * per_dev,)
    full = np.arange(G * per_dev, dtype=np.float64)
    local = full[pid * n_local * per_dev : (pid + 1) * n_local * per_dev]
    arr = jax.make_array_from_process_local_data(sharding, local, global_shape)

    out_rep = NamedSharding(mesh, P())
    total = jax.jit(jnp.sum, out_shardings=out_rep)(arr)
    checksum = float(np.asarray(total))

    # 2. observation-sharded BA across both processes
    from tpu3d.dist import sharded_bundle_adjust
    from tpu3d.config import MeshConfig
    from tpu3d.dist.mesh import make_mesh

    mesh2 = make_mesh(MeshConfig(data_parallel=G, model_parallel=1), jax.devices())
    rng = np.random.default_rng(0)
    n_cams, n_pts = 3, 32
    cams0 = jnp.asarray(rng.normal(0, 0.01, (n_cams, 6)).astype(np.float32))
    X = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 5.0
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv = (X[pt_idx, :2] / X[pt_idx, 2:3]).astype(np.float32)
    w = np.ones(len(cam_idx), np.float32)
    cam_fixed = np.zeros(n_cams, np.float32)
    cam_fixed[0] = 1.0
    st = sharded_bundle_adjust(
        mesh2, cams0, jnp.asarray(X), jnp.asarray(cam_idx),
        jnp.asarray(pt_idx), jnp.asarray(uv), jnp.asarray(w),
        jnp.asarray(cam_fixed), max_iters=2, cg_iters=8)
    cost = float(np.asarray(st.cost))
    assert np.isfinite(cost)

    print(f"OK {checksum:.1f} {cost:.8f}", flush=True)


if __name__ == "__main__":
    main()
