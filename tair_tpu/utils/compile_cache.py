"""Persistent XLA compilation cache.

First compiles of the full model are minutes-long (and much longer through a
remote-compile relay); enabling jax's persistent cache makes every rerun of
bench/val/train with identical shapes near-instant. Safe to call multiple
times.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "/tmp/tair_tpu_xla_cache") -> None:
    import jax

    # CPU AOT artifacts encode host ISA features and can SIGILL on a
    # different machine; cache only accelerator compiles.
    if jax.default_backend() == "cpu":
        return
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
