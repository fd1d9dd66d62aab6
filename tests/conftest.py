"""Test harness config: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile/execute without TPU hardware.

Note: the environment's sitecustomize registers the axon TPU plugin and
force-sets JAX_PLATFORMS=axon at interpreter start, so this must *assign*
(not setdefault) before the first `import jax` in any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
