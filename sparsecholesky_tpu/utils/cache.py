"""Persistent XLA compilation cache setup.

The wavefront factorization program has many batched-panel op instances;
on TPU the first compile is expensive.  Enabling JAX's persistent
compilation cache makes every subsequent process start warm.
"""

from __future__ import annotations

import os


def cache_root() -> str:
    """Directory for all persistent caches (XLA executables, chunk-split
    boundaries, CPU baseline timings).

    Resolution order:
      1. ``SPARSECHOL_CACHE`` env var;
      2. a ``.warmcache/`` directory next to the package (i.e. committed
         into the repo) **if it exists** — the repo survives environment
         resets between driver rounds while ``$HOME`` does not, so a
         warmed, committed cache keeps ``python bench.py`` inside the
         driver's wall-clock budget (remote TPU compiles cost minutes;
         a persistent-cache hit costs seconds);
      3. ``~/.cache/sparsecholesky_tpu``.
    """
    env = os.environ.get("SPARSECHOL_CACHE")
    if env:
        return env
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cand = os.path.join(repo, ".warmcache")
    if os.path.isdir(cand):
        return cand
    return os.path.expanduser("~/.cache/sparsecholesky_tpu")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or cache_root()
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
