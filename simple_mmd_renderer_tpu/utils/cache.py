"""Persistent XLA compilation cache.

Compiles through the axon tunnel take minutes for the full pipeline; the
on-disk cache makes repeat processes (benchmarks, CLI runs) start in seconds.
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    try:
        if jax.default_backend() != "tpu":
            # CPU AOT entries are machine-feature-specific and can SIGILL
            # when loaded on a different host; only cache TPU executables.
            return
        if path is None:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
