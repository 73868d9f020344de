"""Persistent XLA compilation cache for every framework entry point.

Full decode/train programs on TPU compile in minutes (measured: 620 s for
the flamingo-tiny bs=32 decode, 552 s for the flamingo-mini train step —
BENCH_EXTENDED.json / BENCH_TRAIN.json), and without a persistent cache every
process restart and every new (batch, max_length, DecodeConfig) bucket pays
that price again. The reference never faces this (eager PyTorch), so this is
a TPU-native deployment requirement with no reference counterpart: we wire
``jax_compilation_cache_dir`` into ``FlamingoModel``, the trainer, and the
bench harnesses so a serving or training process only ever compiles a given
program shape once per machine.

Knobs (all overridable before first use):
* env ``FLAMINGO_COMPILE_CACHE`` — cache directory; ``0``/``off`` disables.
  Falls back to ``JAX_COMPILATION_CACHE_DIR`` if the user already manages the
  cache themselves, else ``~/.cache/flamingo_mini_tpu/xla_cache``.
* min compile time is set to 2 s (don't persist trivial programs) and the
  min entry size to 0 — a decode program is worth caching at any size.
"""
from __future__ import annotations

import os
from typing import Optional

_ENABLED: Optional[str] = None  # cache dir once enabled; "" = disabled


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or None when disabled (explicitly or
    because the user already configured ``jax_compilation_cache_dir``
    themselves, which we never override).
    """
    global _ENABLED
    if _ENABLED is not None:
        return _ENABLED or None

    env = os.environ.get("FLAMINGO_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        _ENABLED = ""
        return None

    import jax

    if cache_dir is None:
        cache_dir = env or os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            os.path.join(os.path.expanduser("~"), ".cache",
                         "flamingo_mini_tpu", "xla_cache")
    # respect an explicit user-set config value
    existing = jax.config.jax_compilation_cache_dir
    if existing:
        _ENABLED = existing
        return existing

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist anything that took >2 s to compile, regardless of size (the
    # jax default of 60 s would skip mid-sized programs whose recompiles
    # still dominate interactive latency); FLAMINGO_COMPILE_CACHE_MIN_S
    # overrides (the cross-process test uses 0 so a tiny program persists)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(os.environ.get("FLAMINGO_COMPILE_CACHE_MIN_S", 2)))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = cache_dir
    return cache_dir
