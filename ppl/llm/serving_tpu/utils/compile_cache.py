"""Persistent XLA compile-cache location.

The serving tools, bench harness, and tests all share one persistent
compilation cache (the reference sidesteps JIT cost by uploading
pre-compiled pmx slices, ``resource_manager.cc:278-290``; on TPU the
equivalent is XLA's disk cache).  The default lives INSIDE the repo
(``<repo>/.jax_cache/<flavor>``) because the build driver wipes
``~/.cache`` between rounds — a home-dir cache re-pays minutes-per-
program tunnel compiles every round, a repo-local one survives.

Two flavors keep device and host programs apart:
  * ``tpu`` — serving tools / bench programs (axon or real TPU)
  * ``cpu`` — the virtual-mesh test-suite programs
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))


def default_cache_dir(flavor: str = "tpu") -> str:
    """Resolve the compile-cache directory for ``flavor``.

    Environment overrides (first match wins):
      * ``PPL_COMPILE_CACHE`` — explicit directory; empty string disables
        (callers must check for "").
      * ``JAX_COMPILATION_CACHE_DIR`` — JAX's own convention.
    """
    for var in ("PPL_COMPILE_CACHE", "JAX_COMPILATION_CACHE_DIR"):
        if var in os.environ:
            return os.environ[var]
    return os.path.join(_REPO_ROOT, ".jax_cache", flavor)


def configure(jax_module, flavor: str = "tpu",
              min_compile_secs: float = 0.5) -> str:
    """Point ``jax`` at the persistent cache; returns the dir ('' = off).

    The min-compile-time threshold is lowered from JAX's default 1.0s so
    the many medium-sized bucket-grid programs are cached too.
    """
    cache_dir = default_cache_dir(flavor)
    if cache_dir:
        jax_module.config.update("jax_compilation_cache_dir", cache_dir)
        jax_module.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir
