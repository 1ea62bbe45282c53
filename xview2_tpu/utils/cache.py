"""Persistent XLA compilation cache setup.

First compiles of the big fused train step take minutes on a tunneled TPU;
the persistent cache makes every subsequent process start near-instant.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "XVIEW2_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jaxcache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
