"""Persistent XLA compilation cache: repeat runs of the apps/bench skip the
30-90s cycle compiles.  Safe no-op where unsupported."""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_DIR = os.path.expanduser("~/.cache/rcgan_tpu_xla")


def enable(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get("RCGAN_XLA_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - backend-dependent
        log.warning("compilation cache unavailable (%s)", e)
