"""Test config: run on a virtual 8-device CPU mesh (no TPU pod needed).

Env vars must be set before jax initializes its backends, hence the import
order gymnastics here. Real-TPU benchmarking lives in bench.py, not tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
