"""Sharding rules: batch data-parallelism + ViT tensor-parallelism.

Replaces the reference's vestigial `torch.nn.DataParallel(net, device_ids=[0])`
(`/root/reference/utils/trainClass.py:437`) with real pjit sharding:

  * activations/batches shard over the `data` axis;
  * ViT attention (qkv/proj) and MLP (fc1/fc2) weights optionally shard over
    the `model` axis (Megatron-style column/row split — XLA inserts the
    all-reduce on the row-parallel output automatically from the
    annotations).  ViT-B fits on one v5e chip, so TP is off by default
    (SURVEY.md §2.3) but exercised by the multi-chip dry-run.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(mesh: Mesh, x: Any) -> Any:
    """Put array(s) with leading batch dim onto the data axis."""
    def put(a):
        spec = P("data", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree.map(put, x)


def replicate(mesh: Mesh, x: Any) -> Any:
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x)


# --- ViT tensor-parallel rules ---------------------------------------------
# path-suffix -> PartitionSpec for the weight kernel.  Column-parallel for
# qkv/fc1 (split output features), row-parallel for proj/fc2 (split input
# features); biases of row-parallel layers stay replicated.

_VIT_TP_RULES: list[tuple[tuple[str, ...], P]] = [
    (("attn", "qkv", "kernel"), P(None, "model")),
    (("attn", "qkv", "bias"), P("model")),
    (("attn", "proj", "kernel"), P("model", None)),
    (("mlp_fc1", "kernel"), P(None, "model")),
    (("mlp_fc1", "bias"), P("model")),
    (("mlp_fc2", "kernel"), P("model", None)),
]


def vit_param_sharding(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for ViT params: TP rules above, rest replicated."""
    def spec_for(path) -> P:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        for suffix, spec in _VIT_TP_RULES:
            if keys[-len(suffix):] == suffix:
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, a: NamedSharding(mesh, spec_for(path)), params)


def shard_params(mesh: Mesh, params: Any, shardings: Any = None) -> Any:
    """Place params; default fully replicated."""
    if shardings is None:
        return replicate(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
