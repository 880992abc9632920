"""Persistent XLA compilation cache — the warm-start path.

The reference launches and renders immediately (its pipelines are built from
pre-compiled SPIR-V at startup, `src/raytracer/raytracing_renderer.odin`);
the TPU build's analog of that "instant start" is JAX's persistent
compilation cache: the first process pays the ~30 s XLA compile of the frame
program, every later process deserializes it in ~1 s.

Call `enable_persistent_cache()` once per process before the first jit
execution (cli.py and bench.py do). Safe to call twice; respects an existing
user-set `jax_compilation_cache_dir`.
"""

from __future__ import annotations

import logging
import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/raytracer_tpu/xla")

_log = logging.getLogger(__name__)
_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at an on-disk compilation cache and drop the size/time
    thresholds so the frame program is always cached. Returns the dir."""
    global _enabled
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RAYTRACER_TPU_CACHE_DIR", DEFAULT_CACHE_DIR
        )
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: the bench/frame programs are few and large, and
        # even the small helper jits (sort, accumulate) recompile on every
        # process start otherwise.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # older jax without a knob: degrade gracefully
        _log.warning("persistent compilation cache unavailable: %s", e)
        return cache_dir
    _enabled = True
    _log.info("persistent XLA compilation cache at %s", cache_dir)
    return cache_dir
