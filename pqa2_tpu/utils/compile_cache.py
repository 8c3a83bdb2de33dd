"""Persistent XLA compilation cache.

Real-world runs of the scoring workflow are dominated not by compute but by
one-off XLA/Mosaic compilations (tens of seconds per program over a remote
TPU runtime). The reference app has the same shape of problem — ffmpeg/
libvmaf process startup — but at ~1 s, not ~40 s. Persisting compiled
executables on disk makes every run after the first start hot.

Enabled automatically by the engine-layer entry points (VMAFAnalyzer, the
CLI, bench); opt out with ``PQA2_COMPILE_CACHE=0`` or point the cache
somewhere else with ``PQA2_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False
_decided = False


def _cpu_only_forced() -> bool:
    """True when the platform list is pinned to CPU — decidable WITHOUT
    initializing a backend (``jax.default_backend()`` instantiates the
    runtime, which can block on an unreachable remote TPU; non-compute
    entry points must never trigger that)."""
    import jax

    forced = ""
    try:
        forced = jax.config.jax_platforms or ""
    except AttributeError:  # pragma: no cover - very old jax
        forced = os.environ.get("JAX_PLATFORMS", "")
    names = [p.strip().lower() for p in forced.split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)


def enable_compilation_cache() -> bool:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns True if the cache is (now) active.  Callers should treat this
    as a compute-path operation: unless the platform config already pins
    CPU, deciding TPU-vs-CPU initializes the JAX backend."""
    global _enabled, _decided
    if _decided:
        return _enabled
    if os.environ.get("PQA2_COMPILE_CACHE", "1") in ("0", "false", "off"):
        _decided = True
        return False
    cache_dir = os.environ.get(
        "PQA2_COMPILE_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "pqa2_tpu", "jax",
        ),
    )
    try:
        import jax

        # TPU executables only. XLA:CPU persists AOT artifacts keyed to the
        # COMPILE machine's feature set; loading them under a different
        # feature mask logs "could lead to execution errors such as SIGILL"
        # and has produced real interpreter crashes here (full-suite
        # segfault, round 3). CPU compiles are cheap; the cache's value is
        # the minutes-long tunnel Mosaic compiles.
        if _cpu_only_forced():
            _decided = True
            logger.debug("persistent compilation cache skipped (cpu pinned)")
            return False
        if jax.default_backend() != "tpu":
            _decided = True
            logger.debug("persistent compilation cache skipped on %s",
                         jax.default_backend())
            return False

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful compile time; the default
        # threshold (1 s) would skip many small-but-slow-over-the-wire
        # programs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        _decided = True
        logger.debug("persistent compilation cache at %s", cache_dir)
    except Exception as e:  # pragma: no cover - defensive: never block scoring
        logger.warning("compilation cache unavailable: %s", e)
        return False
    return True
