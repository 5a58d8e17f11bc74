"""Persistent XLA compilation cache.

The fused 640px serving program takes minutes to compile cold (and in this
image the compile travels a remote tunnel). Every long-lived entry point
(bench, server, serving bench) enables a repo-local persistent cache so
warm starts are near-instant."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "FRP_COMPILE_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: run uncached
