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


def mesh_from_config(cfg, devices=None) -> Mesh:
    """Mesh from a `config.MeshConfig`: TP degree and axis names come from
    the config (data axis fills the remaining devices)."""
    devices = list(devices if devices is not None else jax.devices())
    mesh = make_mesh(n_model=cfg.model_parallel, devices=devices)
    return Mesh(mesh.devices, (cfg.data_axis, cfg.model_axis))


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build an (data, model) mesh.  Defaults to ALL devices on the data
    axis; an explicit smaller n_data subsets deliberately.  Raises instead
    of silently idling chips (n_model not dividing the device count used
    to drop the remainder) or building a 0-device mesh (n_model > n failed
    confusingly at the first pjit otherwise)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model:
            raise ValueError(
                f"n_model={n_model} does not divide the {n} available "
                f"devices; pass n_data explicitly to subset deliberately")
        n_data = n // n_model
    if n_data < 1 or n_model < 1 or n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} does not fit "
                         f"{n} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def local_mesh() -> Mesh:
    """Single-process mesh over whatever devices exist (1 TPU chip or
    8 virtual CPU devices under --xla_force_host_platform_device_count)."""
    return make_mesh()
