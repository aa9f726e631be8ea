"""Persistent XLA compilation cache.

First compiles through the axon remote-compile tunnel cost 30-130s; the
persistent cache keyed on HLO makes every later process start warm. Called
by bench.py, cli.py and evaluation entry points; harmless on CPU.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "NMC_TPU_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/nmc_tpu_xla_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
