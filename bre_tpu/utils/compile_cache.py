"""Persistent XLA compilation cache (VERDICT round-4 item 1).

Real spec renders are compile-dominated: config 3 (512^2 x 8 x 100k) spent
~97% of its 259 s wall in XLA compilation (BASELINE.md round-4 grid_density
table), and the default test tier on a 2-core box is compile-bound.  The
reference pays its compile once at build time (CMake); we pay per process
per shape — unless compiled executables persist.  JAX's persistent
compilation cache stores serialized executables keyed by (HLO, flags,
backend); a warm process deserializes instead of recompiling (measured on
the axon TPU relay: 3.1 s -> 0.24 s for a toy jit; multi-minute spec graphs
drop to seconds).

``enable_persistent_cache()`` is idempotent and is called by every entry
point (CLI, bench.py, tests/conftest.py, __graft_entry__, examples).

Environment:
  BRE_TPU_COMPILE_CACHE=0        disable entirely
  BRE_TPU_COMPILE_CACHE_DIR=...  override location (default: a per-backend
                                 subtree of <repo>/.xla_cache, kept inside
                                 the repo; JAX keys entries by backend so
                                 CPU/TPU entries coexist safely anyway)
"""

from __future__ import annotations

import os
import pathlib

_enabled = False

# Repo root = three levels up from this file (bre_tpu/utils/compile_cache.py).
_DEFAULT_DIR = str(pathlib.Path(__file__).resolve().parents[2] / ".xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache.  Returns the dir (or None
    if disabled).  Must run before the first compilation to catch it, but is
    safe to call at any time (later compilations still benefit)."""
    global _enabled
    if os.environ.get("BRE_TPU_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("BRE_TPU_COMPILE_CACHE_DIR")
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    if _enabled:
        return cache_dir
    import jax

    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Default threshold (1 s) would skip many medium graphs that still cost
    # real wall-time in aggregate across the test tier; cache everything
    # non-trivial.  Entry-size floor off: small serialized executables are
    # exactly the cheap wins.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir
