"""Runtime configuration: persistent XLA compilation cache.

The encoder's device programs are large (match-resolve + entropy pack); cold
compiles take minutes on TPU. The persistent cache makes every process after
the first start in milliseconds. Called from pipeline/bench entry points.
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax
    if cache_dir is None:
        cache_dir = os.environ.get(
            "ZSTD_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
