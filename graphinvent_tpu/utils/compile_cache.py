"""Persistent XLA compilation cache.

Large-graph programs pay multi-minute XLA compiles on TPU (measured: the
N=40 whole-epoch GGNN program compiles in ~270 s through the tunnel, then
executes in 35 ms/step).  The compiled executable is a pure function of the
HLO, so it is cached on disk: every job / bench / profiler process calls
:func:`enable_compile_cache` before touching the backend and re-runs of the
same configuration skip the compile entirely (measured: 270 s -> ~17 s
including dataset upload).

The reference has no analogue -- PyTorch eager pays no compile, and its
per-batch dynamic shapes would defeat any cache anyway (SURVEY.md §7
design delta 1: static shapes are what make this cacheable).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/graphinvent_tpu/xla")


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Points jax at a persistent on-disk compilation cache.  Idempotent;
    honors ``GRAPHINVENT_COMPILE_CACHE`` (set it to ``off`` to disable)."""
    env = os.environ.get("GRAPHINVENT_COMPILE_CACHE", "")
    if env.lower() == "off":
        return ""
    cache_dir = cache_dir or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache anything that took >1s to compile; tiny programs recompile
    # faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
