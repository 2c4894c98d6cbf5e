"""Persistent XLA compilation cache.

Full-model compiles take minutes through remote-TPU tunnels; enabling
jax's persistent cache makes every rerun of train/test/bench start hot.
Called by all CLIs; override the location with RTFS_COMPILATION_CACHE
(set to "0" to disable).
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    loc = path or os.environ.get("RTFS_COMPILATION_CACHE",
                                 os.path.expanduser("~/.cache/rtfs_tpu_xla"))
    if loc == "0":
        return None
    import jax

    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        # cache every compilation, even fast ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return loc
    except Exception:
        return None
