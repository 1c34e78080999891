"""Process-wide JAX configuration for dsm-tpu entry points.

The mining episode program is re-jitted per frontier-capacity bucket
(mining/engine_device.py); on a TPU behind a network tunnel each compile
costs tens of seconds, so a persistent compilation cache is the
difference between a cold run dominated by XLA and a warm run dominated
by mining.  Called by bench.py and the dsm CLI; library imports never
mutate global config.
"""

from __future__ import annotations

import os

_done = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache = (cache_dir or os.environ.get("DSM_TPU_JAX_CACHE")
             or os.path.join(os.environ.get("DSM_TPU_CACHE",
                                            os.path.expanduser("~/.cache/dsm_tpu")),
                             "jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
