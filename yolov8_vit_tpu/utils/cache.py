"""Persistent XLA compilation cache.

The reference amortizes compilation by serializing a TensorRT engine once
and reloading it (`/root/reference/app.py:27-28`).  The XLA analogue is the
persistent compilation cache: every jitted graph (detector, classifier, the
fused two-stage program) compiles once per (shape, config) and is reloaded
from disk afterwards, which also makes CPU-based tests tractable.
"""
from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("YOLOV8_VIT_TPU_CACHE", _DEFAULT)
    # Namespace the cache per host (machine + ISA flags): XLA:CPU cache
    # entries embed binaries specialized to the writing host's vector ISA,
    # and the AOT loader only WARNS ("could lead to execution errors such
    # as SIGILL", cpu_aot_loader.cc) before running them elsewhere — a
    # repo checkout moved between machines must recompile, not warn-and-run
    # (utils/hostinfo.py; round-4 MULTICHIP dryrun tail).
    from yolov8_vit_tpu.utils.hostinfo import cache_namespace
    sub = os.path.join(path, cache_namespace())
    os.makedirs(sub, exist_ok=True)
    # NOTE: entries written at the top level before namespacing existed are
    # deliberately NOT auto-migrated — only the host that wrote them may
    # claim them, and a fresh host can't tell.  A foreign host simply sees
    # its own empty namespace and recompiles, which is the point.
    jax.config.update("jax_compilation_cache_dir", sub)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return sub
