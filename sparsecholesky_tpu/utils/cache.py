"""Persistent XLA compilation cache setup.

The wavefront factorization program has many batched-panel op instances;
on TPU the first compile is expensive.  Enabling JAX's persistent
compilation cache makes every subsequent process start warm.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SPARSECHOL_CACHE", os.path.expanduser("~/.cache/sparsecholesky_tpu")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags


def setup_runtime() -> None:
    """Apply runtime config for CLI/bench entry points.

    Environments may force a platform via sitecustomize's
    jax.config.update, which silently overrides the JAX_PLATFORMS env var;
    re-honor the env var here so ``JAX_PLATFORMS=cpu python -m
    sparsecholesky_tpu ...`` behaves as documented.
    """
    import jax

    env_plat = os.environ.get("JAX_PLATFORMS")
    if env_plat:
        try:
            jax.config.update("jax_platforms", env_plat)
        except Exception:
            pass
    enable_compilation_cache()
