"""Multi-host initialization helpers.

The reference has no distributed backend at all (SURVEY.md §2.3); this
module is the TPU-native story for scaling past one host: processes join a
jax.distributed cluster over DCN, every host contributes its local chips to
one global mesh, and the SAME pjit-sharded functions from parallel/sharding
run unchanged — XLA routes intra-slice collectives over ICI and inter-host
ones over DCN.  There is still no hand-written communication code anywhere.
"""
from __future__ import annotations

import os

import jax

from yolov8_vit_tpu.parallel.mesh import make_mesh


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join (or bootstrap) the jax.distributed cluster.

    On Cloud TPU pods all arguments auto-detect from the metadata server /
    TPU environment; pass them explicitly elsewhere (or via
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Safe to call once per process before any device query.
    """
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_mesh(n_model: int = 1):
    """Mesh over every chip in the cluster (call after init_multihost)."""
    return make_mesh(n_model=n_model, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
