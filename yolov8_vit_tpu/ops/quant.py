"""W8A8 dynamic quantization for MXU int8 matmuls.

v5e executes int8 matmuls at ~2x the bf16 rate (measured 60 TOPS vs
28 TFLOPS on this chip's tunnel at 4096^3), and the classifier stage
dominates the two-stage pipeline's FLOPs — so the ViT's dense layers get a
quantized path:

  weights:     per-output-channel symmetric int8 (scale = amax/127),
               quantized inside the forward (params stay f32 in engines;
               XLA folds the quantization of a constant-like operand well,
               and the cost is O(in*out) elementwise vs the O(B*in*out)
               matmul);
  activations: per-row dynamic symmetric int8;
  accumulation: int32 on the MXU, rescaled to f32:
               y = (x_i8 @ w_i8) * (s_x * s_w) + b.

Per-row x per-channel scales keep the error at ~1e-2 relative on ViT
logits (tests assert argmax stability on real-scale activations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.ops.lowering import interpret_default


def quantize_weight(w: jnp.ndarray):
    """(in, out) f32 -> (int8 (in,out), scale (out,) f32), per-out-channel."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_act(x: jnp.ndarray):
    """(..., in) -> (int8, scale (..., 1)), per-row dynamic symmetric.

    Plain jnp ops, so this is also THE in-kernel quantization used by every
    fused Pallas kernel (here and in ops/attention.py) — one definition of
    the amax floor / clip constants keeps the kernels bit-identical to
    `quant_dense_pre`."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def layernorm_f32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  eps: float) -> jnp.ndarray:
    """Row LayerNorm in f32 ((M, D) -> (M, D)); shared by the fused
    kernels (quantization accuracy depends on normalizing BEFORE the
    per-row quant, so LN and quant live together)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def quant_dense(x: jnp.ndarray, w: jnp.ndarray,
                bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """f32/bf16 x @ f32 w via int8 MXU; returns f32-accumulated result in
    x.dtype.  Shapes: x (..., in), w (in, out).  Quantizes the weight per
    call — prefer `quant_dense_pre` with weights quantized once offline
    (the per-call variant measured *slower* than bf16 end-to-end)."""
    w_i8, s_w = quantize_weight(w.astype(jnp.float32))
    return quant_dense_pre(x, w_i8, s_w, bias)


def quant_dense_pre(x: jnp.ndarray, w_i8: jnp.ndarray, w_scale: jnp.ndarray,
                    bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """x (..., in) f32/bf16 @ pre-quantized int8 weight (in, out)."""
    out_dtype = x.dtype
    x_i8, s_x = quantize_act(x.astype(jnp.float32))
    lead = x_i8.shape[:-1]
    acc = jax.lax.dot_general(
        x_i8.reshape(-1, x_i8.shape[-1]), w_i8,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32).reshape(*lead, -1)
    y = y * s_x * w_scale[None, :]
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


_BM = 256  # query-rows per fused-kernel program


def _quant_matmul_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *,
                         silu: bool = False):
    """Fused: per-row activation quantization (VMEM-resident, int8 never
    touches HBM) + int8 MXU matmul + rescale + bias (+ optional SiLU
    epilogue — conv-style activations fuse here instead of a separate
    elementwise pass)."""
    x_i8, s_x = quantize_act(x_ref[...].astype(jnp.float32))
    acc = jax.lax.dot_general(x_i8, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * s_x * s_ref[...][None, :]
         + b_ref[...][None, :])
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def quant_dense_fused(x: jnp.ndarray, w_i8: jnp.ndarray,
                      w_scale: jnp.ndarray, bias: jnp.ndarray,
                      silu: bool = False,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Pallas W8A8 dense: measured ~35% faster than the bf16 XLA matmul at
    ViT shapes (the unfused int8 path is *slower* — the activation-quantize
    elementwise passes cost more than int8 saves unless fused).  Bit-identical
    to `quant_dense_pre` (+ SiLU when silu=True: the detector's 1x1
    conv+SiLU blocks)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = interpret_default()
    *lead, k = x.shape
    n = w_i8.shape[1]
    m = 1
    for d in lead:
        m *= d
    xm = x.reshape(m, k)
    m_pad = (m + _BM - 1) // _BM * _BM
    if m_pad != m:
        xm = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_quant_matmul_kernel, silu=silu),
        grid=(m_pad // _BM,),
        in_specs=[
            pl.BlockSpec((_BM, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        interpret=interpret,
    )(xm, w_i8, w_scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out[:m].reshape(*lead, n)


def _quant_mlp_kernel(h_ref, res_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                      s2_ref, b2_ref, o_ref):
    """Whole transformer MLP in one program: quantize -> int8 fc1 ->
    tanh-GELU -> requantize -> int8 fc2 -> +residual.  Two kernel
    boundaries and one (M, hidden) HBM round-trip removed vs layer-wise.

    GELU uses the tanh approximation (Mosaic lacks erfc); its ~1e-3
    relative deviation is far below the ~1e-2 quantization noise."""
    hi, sx = quantize_act(h_ref[...].astype(jnp.float32))
    a = jax.lax.dot_general(hi, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * sx * s1_ref[...][None, :] + b1_ref[...][None, :]
    a = jax.nn.gelu(a, approximate=True)
    ai, sh = quantize_act(a)
    y = jax.lax.dot_general(ai, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sh * s2_ref[...][None, :] + b2_ref[...][None, :]
    o_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def quant_mlp_fused(h: jnp.ndarray, residual: jnp.ndarray,
                    w1_i8, s1, b1, w2_i8, s2, b2,
                    interpret: bool | None = None) -> jnp.ndarray:
    """residual + fc2(gelu(fc1(h))) with both matmuls int8 (see kernel).

    h/residual: (..., D); w1 (D, H) int8; w2 (H, D) int8.  Measured 2.7x
    the bf16 XLA MLP at ViT-B shapes (3.08 -> 1.16 ms for 6400x768x3072)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = interpret_default()
    *lead, d = h.shape
    hid = w1_i8.shape[1]
    m = 1
    for v in lead:
        m *= v
    hm = h.reshape(m, d)
    rm = residual.reshape(m, d)
    m_pad = (m + _BM - 1) // _BM * _BM
    if m_pad != m:
        hm = jnp.pad(hm, ((0, m_pad - m), (0, 0)))
        rm = jnp.pad(rm, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _quant_mlp_kernel,
        grid=(m_pad // _BM,),
        in_specs=[
            pl.BlockSpec((_BM, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), h.dtype),
        interpret=interpret,
    )(hm, rm, w1_i8, s1.astype(jnp.float32), b1.astype(jnp.float32),
      w2_i8, s2.astype(jnp.float32), b2.astype(jnp.float32))
    return out[:m].reshape(*lead, d)


MLP_SUFFIXES = ("mlp_fc1", "mlp_fc2")
# quant="w8a": attention qkv/proj also pre-quantized (the fused attention
# kernel quantizes activations post-LN, which is what keeps this accurate)
MLP_AND_ATTN_SUFFIXES = MLP_SUFFIXES + ("qkv", "proj")


def prequantize_tree(params, match_suffixes=MLP_SUFFIXES):
    """Walk a flax param tree; replace {kernel, bias} of matching module
    names with {kernel_i8, w_scale, bias} (per-out-channel symmetric)."""
    import numpy as np

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in match_suffixes and "kernel" in node:
                w_i8, s = quantize_weight(jnp.asarray(node["kernel"],
                                                      jnp.float32))
                out = {"kernel_i8": w_i8, "w_scale": s}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


def _quant_mlp_ln_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                         w2_ref, s2_ref, b2_ref, o_ref, *, ln_eps: float):
    """`_quant_mlp_kernel` with the pre-norm LayerNorm fused in: the
    residual stream enters ONCE (x is both LN input and residual), removing
    a full (M, D) HBM round-trip per transformer block."""
    x = x_ref[...].astype(jnp.float32)
    h = layernorm_f32(x, lns_ref[...][None, :], lnb_ref[...][None, :], ln_eps)
    hi, sx = quantize_act(h)
    a = jax.lax.dot_general(hi, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * sx * s1_ref[...][None, :] + b1_ref[...][None, :]
    a = jax.nn.gelu(a, approximate=True)
    ai, sh = quantize_act(a)
    y = jax.lax.dot_general(ai, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sh * s2_ref[...][None, :] + b2_ref[...][None, :]
    o_ref[...] = (x + y).astype(o_ref.dtype)


def quant_mlp_ln_fused(x: jnp.ndarray, ln_scale, ln_bias,
                       w1_i8, s1, b1, w2_i8, s2, b2,
                       ln_eps: float = 1e-6,
                       interpret: bool | None = None) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LN(x)))) — the whole pre-norm MLP sub-block with
    both matmuls int8, LN fused (one HBM read of the residual stream
    instead of three)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = interpret_default()
    *lead, d = x.shape
    hid = w1_i8.shape[1]
    m = 1
    for v in lead:
        m *= v
    xm = x.reshape(m, d)
    m_pad = (m + _BM - 1) // _BM * _BM
    if m_pad != m:
        xm = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_quant_mlp_ln_kernel, ln_eps=ln_eps),
        grid=(m_pad // _BM,),
        in_specs=[
            pl.BlockSpec((_BM, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        interpret=interpret,
    )(xm, ln_scale.astype(f32), ln_bias.astype(f32), w1_i8,
      s1.astype(f32), b1.astype(f32), w2_i8, s2.astype(f32),
      b2.astype(f32))
    return out[:m].reshape(*lead, d)
