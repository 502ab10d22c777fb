"""Anchor generation + DFL (distribution focal) box decode.

Parity targets:
 - `make_anchors`: grid points at +0.5 offset per stride level 8/16/32
   (`/root/reference/docs/YOLO_TensorRT_Technical.md:13-50`).  Anchors are
   pure functions of the static input size, so they bake into the jitted
   graph as constants (the TRT build embeds them the same way, :219-221).
 - DFL decode: reg_max=16 distribution -> softmax -> expectation ->
   anchor -/+ ltrb -> x stride (`:53-100`).  One einsum on the MXU.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_anchors(input_hw: tuple[int, int],
                 strides: tuple[int, ...] = (8, 16, 32),
                 grid_cell_offset: float = 0.5):
    """Constant anchor points and per-anchor strides.

    Returns (anchors (A, 2) float32 [x, y in feature units],
             stride_per_anchor (A, 1) float32), A = sum((H/s)*(W/s)).
    """
    h, w = input_hw
    points, strides_out = [], []
    for s in strides:
        fh, fw = h // s, w // s
        sx = np.arange(fw, dtype=np.float32) + grid_cell_offset
        sy = np.arange(fh, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        points.append(np.stack([gx, gy], axis=-1).reshape(-1, 2))
        strides_out.append(np.full((fh * fw, 1), s, dtype=np.float32))
    return jnp.asarray(np.concatenate(points)), jnp.asarray(np.concatenate(strides_out))


def dfl_decode(box_dist: jnp.ndarray, anchors: jnp.ndarray,
               stride_per_anchor: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Decode DFL distributions to xyxy boxes in input-pixel coords.

    Args:
      box_dist: (..., A, 4*reg_max) raw logits, layout [l, t, r, b] each of
        reg_max bins (ultralytics channel order).
      anchors: (A, 2) from `make_anchors` (feature units).
      stride_per_anchor: (A, 1).
    Returns: (..., A, 4) xyxy boxes in input pixels.
    """
    *lead, a, _ = box_dist.shape
    dist = box_dist.reshape(*lead, a, 4, reg_max)
    probs = jax.nn.softmax(dist, axis=-1)
    bins = jnp.arange(reg_max, dtype=probs.dtype)
    ltrb = jnp.einsum("...kr,r->...k", probs, bins)
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchors - lt
    x2y2 = anchors + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1) * stride_per_anchor

