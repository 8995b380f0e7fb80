"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before jax initializes (SURVEY.md §4: same Mesh code that
runs on v5e-8, validated on host CPU devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize prepends its TPU platform to jax_platforms at
# interpreter start; force pure-CPU before the backend initializes so the
# 8-device virtual mesh is available.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
