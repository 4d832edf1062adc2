"""Persistent XLA compilation cache.

The GAN train step (generator + discriminator + VGG19 and three
gradients) costs minutes of XLA compile time on first use.  The
persistent cache makes every subsequent process start instantly —
critical for the reference's restart-based resume workflow (SURVEY.md
section 5: crash recovery is checkpoint-based restart).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX at an on-disk compilation cache; returns the path.

    Override location with ``TORCHSR_COMPILE_CACHE``; disable with
    ``TORCHSR_COMPILE_CACHE=0``.
    """
    import jax

    env = os.environ.get("TORCHSR_COMPILE_CACHE")
    if env == "0":
        return ""
    path = path or env or os.path.expanduser("~/.cache/torchsr_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took meaningful compile time.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
