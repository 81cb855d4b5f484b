"""Persistent XLA compilation cache.

Compiles over the TPU tunnel cost tens of seconds; caching executables on
disk makes repeat searches (and separate processes) start instantly.  Opt
out with ``MMTPU_NO_JIT_CACHE=1``; cache dir override via
``MMTPU_JIT_CACHE_DIR``.
"""

from __future__ import annotations

import os
from pathlib import Path

_done = False


def enable_persistent_cache() -> None:
    global _done
    if _done or os.environ.get("MMTPU_NO_JIT_CACHE"):
        _done = True
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get(
            "MMTPU_JIT_CACHE_DIR",
            str(Path.home() / ".cache" / "mmtpu_jax_cache"),
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass
