"""Persistent XLA compilation cache.

The tunneled single-chip backend makes compilation the dominant fixed
cost of every script run (the flagship train step's fused scan has been
observed to take >25 min to compile under host-CPU contention), and the
stall-watchdog's restart-from-checkpoint recovery model
(:mod:`galaxy_deconv_tpu.utils.watchdog`) re-pays that cost on every
restart.  A persistent on-disk cache makes restarts and repeat
invocations nearly free: XLA executables are keyed by HLO + compile
options + backend, so an identical re-run hits the cache instead of
recompiling.

The reference framework has no analogous machinery (its torch/CUDA
stack JITs nothing); this is TPU-native plumbing, not a port.
"""

from __future__ import annotations

import logging
import os
import pathlib

logger = logging.getLogger("galaxy_deconv_tpu.utils.cache")

_DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None,
                            min_compile_secs: float = 5.0) -> "pathlib.Path | None":
    """Route XLA compilations through an on-disk cache (idempotent).

    Only compilations slower than ``min_compile_secs`` are persisted, so
    CPU-test miniatures don't bloat the cache while every real TPU
    executable (tens of seconds to tens of minutes) is reused across
    process restarts.  Set ``GDT_NO_COMPILE_CACHE=1`` to disable.

    Returns the active cache directory, or ``None`` when the kill switch
    disabled caching (so callers can't mistake an inert path for a live
    cache).
    """
    import jax

    if os.environ.get("GDT_NO_COMPILE_CACHE"):
        logger.info("persistent compile cache disabled by GDT_NO_COMPILE_CACHE")
        return None
    path = pathlib.Path(cache_dir) if cache_dir else _DEFAULT_DIR
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    # cache regardless of how XLA classifies the backend (the tunneled
    # 'axon' platform is exactly the backend we most need caching for)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    logger.info("persistent XLA compile cache at %s", path)
    return path
