"""Process-level environment defaults for lsfa_tpu entry points."""

from __future__ import annotations

import os


def setup_cache(path: str = "/tmp/lsfa_tpu_jax_cache") -> None:
    """Enable the persistent JAX compilation cache (must run before the
    first compilation; safe to call anytime)."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
