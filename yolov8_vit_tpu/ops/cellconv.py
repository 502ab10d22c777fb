"""Space-to-depth ("cell") convolution formulation for small-channel stages.

TPU MXU tiles are 128 lanes wide; a conv with 32-64 channels uses a quarter
of the array and runs at ~8 TFLOPS where the same arithmetic at >=128
channels runs at ~50 (measured, docs/performance.md round-2).  The fix used
here: keep an entire small-channel region of the network in 2x2-cell layout
(B, H/2, W/2, 4C) — every conv becomes a conv over cells with an *embedded*
kernel that carries structural zeros, trading <=4x redundant FLOPs for ~6x
better MXU utilization:

  * 3x3 stride-2 conv (C->C2) -> 3x3 stride-2 cell conv (4C -> 4C2)
  * 3x3 stride-1 conv (C->C2) -> 3x3 stride-1 cell conv (4C -> 4C2)
  * 1x1 conv (C->C2)          -> 1x1 block-diagonal cell conv (4C -> 4C2)

All transforms are weight-side re-parameterizations: the stored checkpoint
layout is the flat conv's {kernel (kh,kw,C,C2), bias (C2,)} and the cell
kernel is constructed inside the forward (a few-KB scatter, constant-folded
relative to the conv).  Numerics: identical products, different f32
accumulation order -> bit-equal in f32 up to reassociation (<=1 ulp),
~1e-2 in bf16 activations (same scale as any layout change).

Measured on v5e (batch 8, yolov8s shapes): b1 stride-2 conv 0.94 -> 0.19 ms,
C2f bottleneck 3x3 0.20 -> 0.08 ms, 1x1 cv 0.086 -> 0.022 ms; cellify of the
region entry 0.06 ms, decellify at exit ~free.

Reference parity: this implements the same Conv/C2f arithmetic the
reference's TRT builder emits layer-by-layer
(`/root/reference/docs/YOLO_TensorRT_Technical.md:160-221`); cell layout is
the TPU-side analogue of TensorRT choosing NC/32HW32 tensor formats for
small-channel layers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cellify(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), sub-position-major lanes:
    out[..., i, j, (2p+q)*C + c] = x[..., 2i+p, 2j+q, c]."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def decellify(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `cellify`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    return x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b, 2 * h, 2 * w, c)


def embed_kernel(kernel: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Flat odd-k conv kernel (kh,kw,Cin,Cout) with SAME padding (kh//2) and
    stride in {1,2} -> cell-conv kernel (3,3,4Cin,4Cout) applied with cell
    stride `stride` and cell padding 1.

    Derivation: output flat pixel m = 2i+p reads input pixel
    r = stride*m + u - pad for tap u; r's cell row/sub-position are
    divmod(stride*p + u - pad, 2) relative to cell 'stride*i'.
    """
    kh, kw, cin, cout = kernel.shape
    pad = kh // 2
    e = jnp.zeros((3, 3, 4 * cin, 4 * cout), kernel.dtype)
    for p in range(2):
        for u in range(kh):
            cu, a = divmod(stride * p + u - pad, 2)
            for q in range(2):
                for v in range(kw):
                    cv, bb = divmod(stride * q + v - pad, 2)
                    e = e.at[cu + 1, cv + 1,
                             (a * 2 + bb) * cin:(a * 2 + bb + 1) * cin,
                             (p * 2 + q) * cout:(p * 2 + q + 1) * cout
                             ].add(kernel[u, v])
    return e


def embed_kernel_1x1(kernel: jnp.ndarray,
                     out_order: jnp.ndarray | None = None) -> jnp.ndarray:
    """Flat 1x1 kernel (1,1,Cin,Cout) -> block-diagonal cell kernel
    (1,1,4Cin,4Cout): sub-positions don't mix under a 1x1 conv.

    out_order: optional permutation of the 4*Cout cell output lanes (an
    index array `perm` such that cell_out[..., l] = canonical[..., perm[l]]);
    lets callers choose a lane order that makes later channel-splits
    contiguous (weight-column permutations are free).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    e = jnp.zeros((1, 1, 4 * cin, 4 * cout), kernel.dtype)
    for pq in range(4):
        e = e.at[0, 0, pq * cin:(pq + 1) * cin,
                 pq * cout:(pq + 1) * cout].set(kernel[0, 0])
    if out_order is not None:
        e = e[:, :, :, out_order]
    return e


def cell_lane_order(parts: list[int]) -> jnp.ndarray:
    """Canonical-cell-lane indices for a flat channel split.

    For a flat tensor split into consecutive channel groups of the given
    sizes, returns `perm` with cell lanes grouped part-major — i.e.
    reordered[..., sum(parts[:k])*4 + pq*parts[k] + c] =
    canonical[..., pq*sum(parts) + off_k + c].  Each regrouped part is
    itself a canonical cell tensor of that part's flat channels.
    """
    total = sum(parts)
    perm = []
    off = 0
    for sz in parts:
        for pq in range(4):
            for c in range(sz):
                perm.append(pq * total + off + c)
        off += sz
    return jnp.asarray(perm, jnp.int32)


def cell_input_perm(parts: list[int]) -> jnp.ndarray:
    """Inverse bookkeeping for concatenated part-major cell tensors feeding
    a 1x1 conv: returns `rows` such that taking the canonical block-diagonal
    kernel's input rows in this order matches a lanes-concatenated
    [part0_cells | part1_cells | ...] input.  rows[l] = canonical input lane
    for concatenated lane l."""
    return cell_lane_order(parts)


def cell_conv(x_cells: jnp.ndarray, e_kernel: jnp.ndarray,
              cell_bias: jnp.ndarray, stride: int,
              pad: int = 1) -> jnp.ndarray:
    """Apply an embedded cell kernel (from `embed_kernel`/`embed_kernel_1x1`)
    with f32 accumulation.  cell_bias is the (4*Cout,) CELL-lane bias — for a
    canonical-order kernel that is `jnp.tile(bias, 4)`; for a kernel built
    with `out_order=perm` it is `jnp.tile(bias, 4)[perm]`."""
    y = jax.lax.conv_general_dilated(
        x_cells, e_kernel.astype(x_cells.dtype), (stride, stride),
        [(pad, pad), (pad, pad)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + cell_bias).astype(x_cells.dtype)
