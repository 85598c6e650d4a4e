"""Persistent XLA compilation cache.

First compiles on this TPU stack go through a remote AOT service and take
minutes for attack loops; the persistent cache makes every subsequent
process start warm.  Called by bench.py and the CLIs.
"""

import os


def enable(cache_dir: str = None):
    import jax
    cache_dir = cache_dir or os.environ.get(
        "SPEAKERGUARD_COMPILE_CACHE",
        os.path.expanduser("~/.cache/speakerguard_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort
