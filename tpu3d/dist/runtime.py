"""Multi-process runtime initialization.

The reference is strictly single-process/single-device (SURVEY §2.2:
`device = cuda if available else cpu` at feature_extraction.py:9 etc.); the
TPU-native scale-out story is `jax.distributed.initialize` + one global
Mesh whose collectives XLA lowers onto ICI/DCN. This module is the one
place process-group setup happens:

  - On a real multi-host TPU slice, `jax.distributed.initialize()` with no
    arguments picks up the cluster environment automatically.
  - For CPU simulation / tests / heterogeneous setups, coordinator address
    and process ids come from TPU3D_COORDINATOR / TPU3D_NUM_PROCESSES /
    TPU3D_PROCESS_ID (or explicit arguments), with
    `xla_force_host_platform_device_count` giving each process a local
    device fan-out — the 2-process CPU test in
    tests/test_dist_multiprocess.py runs exactly this path.
"""
from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_devices: int = 0,
) -> bool:
    """Initialize the JAX process group if configured; returns True when
    running multi-process. Must run before any jax device/backend use.

    With no arguments and no TPU3D_* environment, does nothing (single
    process) unless a cluster environment is auto-detectable, in which case
    `jax.distributed.initialize()` with defaults is attempted by the
    caller's explicit request only (pass num_processes=-1)."""
    coordinator = coordinator or os.environ.get("TPU3D_COORDINATOR")
    if num_processes is None and "TPU3D_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TPU3D_NUM_PROCESSES"])
    if process_id is None and "TPU3D_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TPU3D_PROCESS_ID"])
    if local_devices == 0 and "TPU3D_LOCAL_DEVICES" in os.environ:
        local_devices = int(os.environ["TPU3D_LOCAL_DEVICES"])

    if local_devices:
        flag = f"--xla_force_host_platform_device_count={local_devices}"
        if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flag).strip()

    if num_processes == -1:
        import jax

        jax.distributed.initialize()
        return True
    if not coordinator or not num_processes or process_id is None:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
