"""Process-level JAX configuration: persistent compilation cache.

The TPU backend in this environment compiles through a remote service whose
latency is highly variable (observed 3 s .. 460+ s for the same program).
The persistent cache makes every entry-point process (train / eval / decode /
bench) reuse programs compiled by any earlier process, which both hides that
variance and matches how the bucketed static shapes are meant to amortize.

Import and call ``setup()`` before building any jitted computation.
"""

from __future__ import annotations

import os

_DONE = False


def setup(cache_dir: str | None = None):
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "E2E_ASR_COMPILE_CACHE", os.path.expanduser("~/.cache/e2e_asr_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
