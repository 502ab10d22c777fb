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
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
