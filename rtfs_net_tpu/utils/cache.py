"""Persistent XLA compilation cache + workaround XLA flags.

Full-model compiles take minutes through remote-TPU tunnels; enabling
jax's persistent cache makes every rerun of train/test/bench start hot.
Called by all CLIs; override the location with RTFS_COMPILATION_CACHE
(set to "0" to disable).
"""
from __future__ import annotations

import os

# XLA's space-to-batch conv rewrite CRASHES the TPU compiler (libtpu
# 2026-08: `space_to_batch_converter.cc` CHECK failure, "limit index
# (32000) must be <= dimension size (31936)") on the backward of the
# CTCNet time-domain encoder/decoder convs (k=21 s=10 over 32 k samples,
# reference encoder.py:58-119). Disabling the pass fixes the crash AND
# measured FASTER everywhere it was tried: RTFS-4 train 55.0 -> 48.9
# ms/step (B=4), B=16 116 -> 107.2 ms/step, AV-with-backbone train
# 55.5 -> 52.4 ms/step, serving unchanged (245.0 vs 245.4 utt/s).
_WORKAROUND_FLAGS = "--xla_disable_hlo_passes=space-to-batch-converter"


def configure_xla_flags() -> None:
    """Append workaround flags to XLA_FLAGS (must run before the jax
    backend initializes; idempotent; set RTFS_NO_XLA_WORKAROUNDS=1 to
    opt out)."""
    if os.environ.get("RTFS_NO_XLA_WORKAROUNDS") == "1":
        return
    cur = os.environ.get("XLA_FLAGS", "")
    if "space-to-batch-converter" in cur:
        return
    # XLA parses repeated flags last-wins: a user-supplied
    # --xla_disable_hlo_passes list must be MERGED with ours, not
    # shadowed by a second instance of the flag.
    parts = cur.split()
    for i, p in enumerate(parts):
        if p.startswith("--xla_disable_hlo_passes="):
            parts[i] = p + ",space-to-batch-converter"
            os.environ["XLA_FLAGS"] = " ".join(parts)
            return
    os.environ["XLA_FLAGS"] = (cur + " " + _WORKAROUND_FLAGS).strip()


def enable_compilation_cache(path: str | None = None) -> str | None:
    configure_xla_flags()
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
