"""Persistent XLA compilation cache for the tunneled-TPU environment.

On this setup every process pays remote compiles through the TPU tunnel
(25-300 s for image-sized programs — docs/PARITY.md), which swamps short
data-generation and evaluation runs. JAX's persistent compilation cache
keys on the optimized HLO, so identical programs compiled by an earlier
process load in milliseconds (measured: 5.7 s -> 0.2 s cross-process).

``maybe_enable()`` turns it on unless the user opted out; call it at CLI
entry before any jit executes. Knobs:

- ``MMDYN_COMPILE_CACHE``: cache directory; ``0``/``off`` disables; unset
  uses ``/tmp/mmdyn_xla_cache``.
- Programs that took >0.5 s to compile are persisted (the JAX default of
  1.0 would skip mid-sized kernels that still cost a tunnel round-trip).

The cache is content-addressed (HLO + compile options + backend), so code
changes can never load a stale executable — they simply miss.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/mmdyn_xla_cache"
_enabled = False


def maybe_enable(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache; returns the dir or None.

    Safe to call multiple times and after jax import (but call before the
    first jit compilation for full effect).
    """
    global _enabled
    env = os.environ.get("MMDYN_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "false"):
        return None
    path = cache_dir or env or _DEFAULT_DIR
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    if not _enabled:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
    return path
