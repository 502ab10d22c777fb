"""Fused multi-head attention as a Pallas TPU kernel.

ViT-B/8's 785-token sequence is MXU-unfriendly (not lane-aligned), and the
unfused XLA path materializes the (T, T) score tensor in HBM per head.
This kernel pads tokens to a lane-aligned length once, keeps K/V resident
in VMEM (T<=1024 and D=64 fit comfortably: ~460 KB at bf16), computes the
whole softmax(QK^T)V for a 128-row Q block in one program, and masks the
padded keys — one HBM round-trip for the block instead of three.

Layout: (BH, T_pad, D) with grid (BH, T_pad/BQ).  Padded *query* rows
produce garbage rows that the caller slices off; padded *key* columns are
masked to -inf before the softmax so they contribute nothing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128  # query rows per program


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    q = q_ref[0]                         # (BQ, D)
    k = k_ref[0]                         # (T_pad, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (BQ, T_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_real, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool | None = None) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v over (B, T, H, D) inputs -> (B, T, H, D).

    Numerically matches the plain XLA formulation (tests assert ~1e-2 in
    bf16 / 1e-5 in f32).  `interpret=None` auto-selects interpreter mode off
    TPU so CPU tests exercise the same kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h, d = q.shape
    scale = d ** -0.5
    t_pad = _round_up(t, _BQ)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attn_kernel, t_real=t, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BQ, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :t].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))
