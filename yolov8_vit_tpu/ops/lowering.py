"""Target-platform plumbing for Pallas kernel lowering.

Pallas kernels bake their lowering mode at TRACE time: ``interpret=True``
becomes an HLO-emulated sequential loop, ``interpret=False`` a Mosaic
``tpu_custom_call``.  Kernel call sites default the flag off the *target*
platform — normally the process backend, but cross-platform ``jax.export``
(runtime/export.py::_write_stablehlo) traces on one platform for another,
and a CPU build box exporting a "tpu" module must still emit real Mosaic
kernels (the TensorRT analogue: an engine built for the deploy GPU, not
the build host).  ``lowering_target`` scopes that override.
"""
from __future__ import annotations

import contextlib

import jax

_TARGET: list[str] = []


@contextlib.contextmanager
def lowering_target(platform: str):
    """Scope kernel lowering decisions to `platform` ('tpu', 'cpu', ...)
    instead of the process backend — used by cross-platform export."""
    _TARGET.append(platform)
    try:
        yield
    finally:
        _TARGET.pop()


def target_platform() -> str:
    """The platform kernel lowering should aim at: the innermost
    `lowering_target` scope, else the process backend."""
    return _TARGET[-1] if _TARGET else jax.default_backend()


def interpret_default() -> bool:
    """Default for Pallas `interpret=`: emulate everywhere except a TPU
    lowering target (Mosaic compiles fine from any host; axon counts as
    tpu because jax.default_backend() reports it as such)."""
    return target_platform() != "tpu"
