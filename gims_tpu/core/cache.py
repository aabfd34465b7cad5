"""Persistent XLA compilation cache shared by every entry point.

The fused pipeline is ONE large XLA program per (H, W, batch, knob set);
under the tunneled TPU a cold compile costs minutes. Caching executables
on disk makes every later process (bench, quality eval, serving, the
199-pair record sweep) replay them instantly. Call sites: bench.py, the
CLIs, scripts/*. Opt out with GIMS_NO_COMPILE_CACHE=1 (e.g. to measure
cold-compile time itself).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("GIMS_COMPILE_CACHE", "/root/.jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("GIMS_NO_COMPILE_CACHE") == "1":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
