"""Host fingerprinting for compiled-artifact compatibility.

A PJRT-compiled executable (`.jaxcomp`, runtime/engine.py) is machine-
specific the way a TensorRT plan is GPU-specific
(`/root/reference/docs/YOLO_TensorRT_Technical.md:228-230`): XLA:CPU bakes
the build host's vector ISA into the binary, and its AOT loader only WARNS
("could lead to execution errors such as SIGILL", cpu_aot_loader.cc) before
executing such a blob on a host missing those features.  This module lets
the runtime REFUSE instead:

  * `attach_compiled` records `host_fingerprint()` in a sidecar next to
    each blob; `Engine.__init__` checks it with `compatible()` and demotes
    mismatched blobs to the portable `.jaxexp`/jit path (engine.py).
  * the persistent XLA compilation cache gets the same treatment by
    namespacing its directory with `cache_namespace()` (utils/cache.py),
    so cache entries written by one machine are never deserialized by a
    different one.
"""
from __future__ import annotations

import hashlib
import json
import platform


def cpu_flags() -> list[str]:
    """Sorted ISA feature flags of the running host (x86 `flags` /
    arm64 `Features` lines of /proc/cpuinfo); [] where unreadable (non-
    Linux) — which degrades to 'always compatible', i.e. today's
    warn-and-run behavior, never a false refusal."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.split(":")[0].strip().lower() in ("flags", "features"):
                    return sorted(set(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return []


def host_fingerprint(backend: str, device_kind: str | None = None) -> dict:
    """What a compiled blob built HERE depends on: the backend, the
    accelerator chip kind (TPU binaries are chip-specific), and — for CPU
    binaries — the architecture + ISA flag set XLA targeted."""
    fp: dict = {"backend": backend, "machine": platform.machine()}
    if backend == "cpu":
        fp["cpu_flags"] = cpu_flags()
    elif device_kind is not None:
        fp["device_kind"] = device_kind
    return fp


def compatible(blob_fp: dict, host_fp: dict) -> bool:
    """Can a binary compiled under `blob_fp` execute on `host_fp`?

    CPU: the build host's ISA flags must be a SUBSET of the running
    host's (XLA emits code up to the build host's features; a superset
    host runs it fine, a host missing any targeted feature is a SIGILL
    risk).  Accelerators: the device kind must match exactly."""
    if blob_fp.get("backend") != host_fp.get("backend"):
        return False
    if blob_fp.get("backend") == "cpu":
        if blob_fp.get("machine") != host_fp.get("machine"):
            return False
        return set(blob_fp.get("cpu_flags", ())) <= \
            set(host_fp.get("cpu_flags", ()))
    return blob_fp.get("device_kind") == host_fp.get("device_kind")


def cache_namespace() -> str:
    """8-hex tag of (machine, ISA flags) for per-host compilation-cache
    directories.  jax's cache key covers platform and program but NOT the
    host CPU the backend compiled for; two machines sharing one cache dir
    would otherwise exchange warned-SIGILL-risk binaries."""
    blob = json.dumps({"machine": platform.machine(),
                       "cpu_flags": cpu_flags()}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:8]
