"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-host behaviour is exercised exactly as SURVEY.md section 4 prescribes:
``xla_force_host_platform_device_count`` gives 8 CPU devices so the same
shard_map collectives used on a TPU pod slice run in CI without hardware.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which must stay reserved for bench.py. Tests exercise the identical
# shard_map collectives on a virtual 8-device CPU mesh (SURVEY.md section 4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon,
# so env vars alone are too late — override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
