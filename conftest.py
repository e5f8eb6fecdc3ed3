# Repo-root conftest: makes `import tpu3d` work from a source checkout and
# pins tests to a virtual 8-device CPU platform (the JAX-idiomatic fake pod).
#
# Notes on this image:
# - sitecustomize registers an 'axon' remote-TPU backend and force-sets
#   jax_platforms='axon,cpu' at interpreter start, overriding the
#   JAX_PLATFORMS env var — we override back through jax.config before any
#   backend initializes.
# - The registration itself contends for the SHARED TPU pool (a CPU-only
#   pytest run can stall many minutes behind a device claim). Running tests
#   with PALLAS_AXON_POOL_IPS unset skips the registration entirely:
#       PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
