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


def enable_compilation_cache() -> bool:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns True if the cache is (now) active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("PQA2_COMPILE_CACHE", "1") in ("0", "false", "off"):
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
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        # TPU executables only. XLA:CPU persists AOT artifacts keyed to the
        # COMPILE machine's feature set; loading them under a different
        # feature mask logs "could lead to execution errors such as SIGILL"
        # and has produced real interpreter crashes here (full-suite
        # segfault, round 3). CPU compiles are cheap; the cache's value is
        # the minutes-long tunnel Mosaic compiles.
        if jax.default_backend() != "tpu":
            logger.debug("persistent compilation cache skipped on %s",
                         jax.default_backend())
            return False

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful compile time; the default
        # threshold (1 s) would skip many small-but-slow-over-the-wire
        # programs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        logger.debug("persistent compilation cache at %s", cache_dir)
    except Exception as e:  # pragma: no cover - defensive: never block scoring
        logger.warning("compilation cache unavailable: %s", e)
        return False
    return True
