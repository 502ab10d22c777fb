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

from yolov8_vit_tpu.ops.lowering import interpret_default

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
        interpret = interpret_default()
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


def _sdpa_per_head(qkv, oacc, g: int, t: int, d: int, heads: int, dt,
                   t_real: int | None = None):
    """Per-image, per-head softmax(qk^T)v over a packed (g*t, 3d) QKV
    buffer, writing head outputs into the (g*t, d) VMEM scratch.

    Heads are processed one at a time with plain value slices; an earlier
    block-diagonal two-head formulation using partial-lane scratch stores
    was both slower AND silently corrupted data on hardware (clean in
    interpret mode) — keep the scratch-free form.

    t_real < t masks key columns >= t_real to -inf before the softmax
    (lane-padded sequences, e.g. ViT-B/8's 785 tokens padded to 896):
    padded keys contribute nothing; padded QUERY rows produce bounded
    garbage the caller's final cls-token slice never reads."""
    hd = d // heads
    scale = jnp.asarray(hd ** -0.5, dt)
    for gi in range(g):
        r0 = gi * t
        for hh in range(heads):
            c0 = hh * hd
            qh = qkv[r0:r0 + t, c0:c0 + hd] * scale
            kh = qkv[r0:r0 + t, d + c0:d + c0 + hd]
            vh = qkv[r0:r0 + t, 2 * d + c0:2 * d + c0 + hd]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if t_real is not None and t_real < t:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < t_real, s, -jnp.inf)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            o2 = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            oacc[r0:r0 + t, c0:c0 + hd] = o2.astype(dt)


def _attn_group_size(b: int, t: int) -> int:
    """Images per program: keep the per-program QKV buffer ~<=4 MB."""
    g = max(1, min(b, 1024 // t if t >= 256 else 4))
    while b % g:
        g -= 1
    return g


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wp_ref,
                       bp_ref, o_ref, oacc, *, heads: int, ln_eps: float,
                       t_real: int | None = None):
    """Whole pre-norm attention sub-block for `g` images in one program:

        out = x + proj( sdpa( qkv( LN1(x) ) ) )

    All intermediates (LN output, fused-QKV activations, per-head scores,
    softmax, head outputs) live in VMEM — the XLA path round-trips each to
    HBM.
    """
    from yolov8_vit_tpu.ops.quant import layernorm_f32
    g, t, d = x_ref.shape
    dt = x_ref.dtype
    xx = x_ref[...].reshape(g * t, d).astype(jnp.float32)
    h = layernorm_f32(xx, lns_ref[...][None, :], lnb_ref[...][None, :],
                      ln_eps).astype(dt)
    qkv = (jax.lax.dot_general(h, wq_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bq_ref[...][None, :]).astype(dt)
    _sdpa_per_head(qkv, oacc, g, t, d, heads, dt, t_real)
    y = jax.lax.dot_general(oacc[...], wp_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + bp_ref[...][None, :]
    o_ref[...] = (xx + y).reshape(g, t, d).astype(o_ref.dtype)


def _attn_block_kernel_i8(x_ref, lns_ref, lnb_ref, wq_ref, sq_ref, bq_ref,
                          wp_ref, sp_ref, bp_ref, o_ref, oacc, *,
                          heads: int, ln_eps: float,
                          t_real: int | None = None):
    """`_attn_block_kernel` with the QKV and output projections W8A8:
    activations per-row dynamically quantized AFTER the LayerNorm (post-LN
    activations are outlier-tamed, which is what makes int8 here accurate —
    a pre-LN attempt measured ~6% output error, this one ~0.5%), weights
    per-out-channel int8.  SDPA stays bf16 (scores exponentiate errors).
    Measured 0.213 vs 0.260 ms/block at ViT-B/16 x32-crop shapes."""
    from yolov8_vit_tpu.ops.quant import layernorm_f32, quantize_act
    g, t, d = x_ref.shape
    dt = x_ref.dtype
    xx = x_ref[...].reshape(g * t, d).astype(jnp.float32)
    h = layernorm_f32(xx, lns_ref[...][None, :], lnb_ref[...][None, :],
                      ln_eps)
    hi, sx = quantize_act(h)
    acc = jax.lax.dot_general(hi, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * sx * sq_ref[...][None, :]
           + bq_ref[...][None, :]).astype(dt)
    _sdpa_per_head(qkv, oacc, g, t, d, heads, dt, t_real)
    oi, so = quantize_act(oacc[...].astype(jnp.float32))
    acc2 = jax.lax.dot_general(oi, wp_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = (acc2.astype(jnp.float32) * so * sp_ref[...][None, :]
         + bp_ref[...][None, :])
    o_ref[...] = (xx + y).reshape(g, t, d).astype(o_ref.dtype)


def fused_attention_block_i8(x: jnp.ndarray, ln_scale, ln_bias,
                             wqkv_i8, sqkv, bqkv, wproj_i8, sproj, bproj,
                             *, heads: int, ln_eps: float = 1e-6,
                             t_real: int | None = None,
                             interpret: bool | None = None) -> jnp.ndarray:
    """W8A8 QKV/proj variant of `fused_attention_block`.  Weights are
    pre-quantized per-out-channel int8 (ops.quant.quantize_weight /
    prequantize_tree with the attention suffixes).  t_real: see
    `_sdpa_per_head` (lane-padded sequences)."""
    if interpret is None:
        interpret = interpret_default()
    b, t, d = x.shape
    g = _attn_group_size(b, t)
    f32 = jnp.float32
    args = (ln_scale.astype(f32), ln_bias.astype(f32), wqkv_i8,
            sqkv.astype(f32), bqkv.astype(f32), wproj_i8,
            sproj.astype(f32), bproj.astype(f32))
    return pl.pallas_call(
        functools.partial(_attn_block_kernel_i8, heads=heads, ln_eps=ln_eps,
                          t_real=t_real),
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(a.shape,
                               (lambda n: (lambda i: (0,) * n))(a.ndim),
                               memory_space=pltpu.VMEM)
                  for a in args],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((g * t, d), x.dtype)],
        interpret=interpret,
    )(x, *args)


def fused_attention_block(x: jnp.ndarray, ln_scale, ln_bias, wqkv, bqkv,
                          wproj, bproj, *, heads: int, ln_eps: float = 1e-6,
                          t_real: int | None = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """x (B, T, D) -> x + proj(MHA(LayerNorm(x))), one Pallas program per
    group of images.  Measured 0.44 vs 0.69 ms for the XLA sub-block at
    ViT-B/16 x32-crop shapes on v5e.  t_real: see `_sdpa_per_head`."""
    if interpret is None:
        interpret = interpret_default()
    b, t, d = x.shape
    g = _attn_group_size(b, t)
    dt = x.dtype
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, heads=heads, ln_eps=ln_eps,
                          t_real=t_real),
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(a.shape,
                               (lambda n: (lambda i: (0,) * n))(a.ndim),
                               memory_space=pltpu.VMEM)
                  for a in (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dt),
        scratch_shapes=[pltpu.VMEM((g * t, d), dt)],
        interpret=interpret,
    )(x, ln_scale.astype(f32), ln_bias.astype(f32), wqkv.astype(dt),
      bqkv.astype(f32), wproj.astype(dt), bproj.astype(f32))
    return out
