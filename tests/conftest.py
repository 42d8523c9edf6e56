"""Test config: run on a virtual 8-device CPU mesh (no TPU pod needed).

This environment's sitecustomize registers the remote `axon` TPU backend at
interpreter start and it wins over the JAX_PLATFORMS env var, so the env
vars alone are NOT enough — jax.config.update after import is what actually
pins tests to CPU. Without it every tiny test shape goes through the remote
TPU compile service (minutes of latency). Real-TPU benchmarking lives in
bench.py, not tests.
"""

import os

# must be set before jax initializes backends (for the device count)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
