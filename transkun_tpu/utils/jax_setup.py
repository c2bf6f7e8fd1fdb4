"""Process-level JAX setup: persistent compilation cache.

The flagship model takes tens of seconds to compile at the 16 s segment
shape; the persistent cache makes every later process start instantly.
"""

import os


def setup_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "TRANSKUN_TPU_CACHE", os.path.expanduser("~/.cache/transkun_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
