"""Persistent XLA compilation cache management.

A production framework must not pay jit-compile latency on every process
start: the reference's per-plugin NumPy has no compile step, so our "cold
run" numbers would otherwise carry tens of seconds of XLA work the second
process shouldn't repeat. jax ships a persistent compilation cache (disk
keyed by HLO fingerprint + compile options + backend); this module turns it
on once per process, pointed at a stable per-user directory, so every
Context/CLI/benchmark process after the first reuses compiled executables.

Cache correctness is owned by jax/XLA (the key covers the computation and
the toolchain); our lineage hashing stays orthogonal — it keys *data*, this
keys *executables*.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional, Union

logger = logging.getLogger(__name__)

_configured: Optional[str] = None

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "waveformanalysis_tpu", "xla_cache"
)


def _configured_platform() -> str:
    """The jax platform string WITHOUT initializing a backend (config first,
    then env). Initializing the backend here would open the TPU tunnel even
    for host-only Contexts."""
    try:
        import jax

        value = jax.config.jax_platforms
        if value:
            return str(value).split(",")[0]
    except Exception:  # pragma: no cover
        pass
    return (os.environ.get("JAX_PLATFORMS") or "").split(",")[0]


def ensure_compilation_cache(
    cache_dir: Union[str, Path, None] = None,
    force: bool = False,
) -> Optional[str]:
    """Enable the persistent jax compilation cache (idempotent).

    Returns the active cache dir, or None if disabled/unavailable. The first
    caller wins for the whole process (jax reads the config at first
    compile); later calls with a different dir log and keep the first.

    Policy: enabled by default on accelerator backends (tpu/axon/gpu),
    where a single kernel compile costs seconds to tens of seconds. On the
    CPU backend it is opt-in (``force=True`` or ``WFA_COMPILE_CACHE_DIR``):
    compiles there are sub-second and XLA's CPU AOT deserializer logs noisy
    pseudo-feature mismatch errors on every load.
    Set the env var ``WFA_NO_COMPILE_CACHE=1`` to disable globally.
    """
    global _configured
    if os.environ.get("WFA_NO_COMPILE_CACHE"):
        return None
    env_dir = os.environ.get("WFA_COMPILE_CACHE_DIR")
    if not force and not env_dir and cache_dir is None:
        if _configured_platform() == "cpu":
            return None
    path = str(cache_dir or env_dir or DEFAULT_CACHE_DIR)
    if _configured is not None:
        if path != _configured:
            logger.debug(
                "compilation cache already configured at %s; ignoring %s",
                _configured, path,
            )
        return _configured
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every executable: our kernels are small but latency-critical
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _configured = path
        return path
    except Exception as exc:  # pragma: no cover - depends on jax build
        logger.warning("persistent compilation cache unavailable: %s", exc)
        return None
