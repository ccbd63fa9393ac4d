"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding tests run on the host platform with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4: the reference has
no tests; our multi-host strategy is CPU-simulated meshes).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
