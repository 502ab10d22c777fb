"""Device-mesh construction.

The reference is a single-GPU system with no distributed backend (SURVEY.md
§2.3: `device = "cuda:0"`, no NCCL/MPI anywhere).  The TPU-native scaling
story is a `jax.sharding.Mesh` over the slice's ICI links:

  * `data` axis — primary scaling axis (batched inference + training),
  * `model` axis — optional tensor parallelism for the ViT.

Collectives (psum/all_gather/reduce_scatter) are emitted by the XLA
partitioner from sharding annotations; there is no hand-written comm layer.
Multi-host extends the same mesh over DCN via `jax.distributed.initialize`.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build an (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def local_mesh() -> Mesh:
    """Single-process mesh over whatever devices exist (1 TPU chip or
    8 virtual CPU devices under --xla_force_host_platform_device_count)."""
    return make_mesh()
