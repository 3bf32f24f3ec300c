"""Persistent XLA compilation cache for CLI entry points.

The joint two-stage graph takes ~50 s to compile on a v5e host and every
fresh process pays it (the reference is eager PyTorch and amortises
nothing).  With the persistent cache enabled a warm process start replays
the compiled executable in well under a second — this makes `--eval_all`
sweeps, repeated training launches and the bench tools start at interactive
speed.

Opt-out / relocation via ``POINTRCNN_JAX_CACHE``: ``0`` disables, any other
value is used as the cache directory (default
``~/.cache/pointrcnn_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Enable the JAX persistent compilation cache; returns the dir or None."""
    env = os.environ.get("POINTRCNN_JAX_CACHE", "")
    if env == "0":
        return None
    if not env and os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
        # remote-relay TPU (axon): loading a cached serialized executable
        # goes through the relay and measures as slow as recompiling
        # (~330 s for the 12 MB two-stage eval executable), so the cache
        # buys nothing there.  Opt in explicitly via POINTRCNN_JAX_CACHE=dir.
        return None
    path = env or os.path.join(
        os.path.expanduser("~"), ".cache", "pointrcnn_tpu", "xla"
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that takes >=1 s regardless of artifact size
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimisation — never fail a CLI over it
        return None
    return path
