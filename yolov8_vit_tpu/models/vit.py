"""Vision Transformer classifier stack (pure JAX / flax.linen, NHWC).

Capability parity with the reference's stage-2 classifier: a timm
`vit_base_patch8_224.augreg_in21k` backbone (num_classes=1000) wrapped by a
custom MLP head ReLU -> Linear(1000, 128) -> ReLU -> Linear(128, num_class)
(`/root/reference/utils/utils.py:59-87`,
`/root/reference/utils/class_config.py:21`).

Architecture notes (timm augreg ViT-B/8):
  patch conv 8x8/8 -> 784 tokens, +cls token = 785; learned pos-embed;
  12 pre-norm blocks (dim 768, 12 heads, MLP ratio 4, GELU, LN eps 1e-6);
  final LN; classifier reads the cls token.

TPU-first choices: NHWC patchify as a conv (MXU), fused QKV projection as a
single (D, 3D) matmul, attention via einsum with fp32 accumulation,
optionally bf16 activations/weights.  Sequence length 785 is static, so the
whole forward jits once.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    img_size: int = 224
    patch: int = 8
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    backbone_classes: int = 1000       # timm head size the wrapper consumes
    ln_eps: float = 1e-6
    # "xla": einsum attention; "pallas": flash-attention kernel for the sdpa
    # only; "fused": whole attention sub-block (LN1+qkv+sdpa+proj+residual)
    # as one Pallas program (ops/attention.py::fused_attention_block) —
    # the fast inference path
    attn_impl: str = "xla"
    # W8A8 int8 dense layers (ops/quant.py): "none" | "dynamic" (weights
    # quantized per forward; f32 param layout) | "w8" (pre-quantized int8
    # MLP kernels — convert with ops.quant.prequantize_tree) | "w8a" (w8 +
    # int8 QKV/output projections inside the fused attention kernel; needs
    # attn_impl="fused" and prequantize_tree(params, MLP_AND_ATTN_SUFFIXES))
    quant: str = "none"
    # Lane-pad the token sequence to this length right after pos-embed
    # (0 = off).  ViT-B/8's 785 tokens are MXU-hostile: 785 % 8 != 0 makes
    # every per-image row slice sublane-misaligned and every (T, T) score
    # dot pads 785 -> 896 lanes implicitly anyway.  Padding ONCE to a
    # multiple of 128 with masked attention keys keeps all kernels on
    # aligned shapes; the cls-token output is bit-unchanged (padded keys are
    # masked to -inf, padded rows are row-local elsewhere and never read).
    # Param tree is unchanged (pos_embed stays `tokens`-sized).
    pad_tokens: int = 0

    def __post_init__(self):
        if self.attn_impl not in ("xla", "pallas", "fused"):
            raise ValueError(f"unknown attn_impl {self.attn_impl!r}")
        if self.quant not in ("none", "dynamic", "w8", "w8a"):
            raise ValueError(f"unknown quant {self.quant!r}")
        if self.quant == "w8a" and self.attn_impl != "fused":
            # Block's w8a branch only exists on the fused path; without this
            # check the spec silently runs f32 attention (or apply fails
            # deep in flax when params were prequantized with the attention
            # suffixes)
            raise ValueError("quant='w8a' requires attn_impl='fused'")
        if self.pad_tokens:
            if self.pad_tokens < self.tokens:
                raise ValueError(
                    f"pad_tokens {self.pad_tokens} < sequence {self.tokens}")
            if self.attn_impl == "pallas":
                # flash_attention masks its own internal padding from the
                # full input length; external padding would unmask it
                raise ValueError("pad_tokens requires attn_impl 'fused' or "
                                 "'xla'")

    @property
    def tokens(self) -> int:
        return (self.img_size // self.patch) ** 2 + 1

    @property
    def seq_len(self) -> int:
        """Compute-time sequence length (tokens, or pad_tokens when set)."""
        return self.pad_tokens if self.pad_tokens else self.tokens


VIT_B8_224 = ViTSpec()
VIT_B16_224 = ViTSpec(patch=16)
VIT_S16_224 = ViTSpec(patch=16, dim=384, heads=6)
VIT_L16_224 = ViTSpec(patch=16, dim=1024, depth=24, heads=16)


def vit_compiler_options(spec: ViTSpec, platform: str | None = None
                         ) -> dict | None:
    """Per-compile jit options a graph containing this ViT needs on TPU.

    The fused attention kernel near the scoped-VMEM edge needs the limit
    raised (the axon terminal forwards proto-backed xla_* flags
    per-compile; the raise is admissibility-only — round-2 sweeps measured
    no perf effect).  The edge depends on Mosaic's pipelining headroom,
    which grows with the CROP-GRID length as well as the token count —
    observed hardware-compile OOMs: t=896 lane-padded B/8 at any grid
    (~16.01 MB), t=785 B/8 at a 128-crop grid (16.5 MB), and t=197 B/16
    at a 512-crop grid (16.09 MB, dense-serve sweep).  The spec cannot
    see the grid length, so the gate is simply: every fused-attention
    spec on the TPU backend.  None elsewhere: the CPU backend rejects
    TPU flags.  `platform` overrides the backend check for cross-platform
    export (runtime/export.py bakes these into the native driver's
    .opts.pb, which always compiles on TPU)."""
    import jax
    if platform is None:
        platform = jax.default_backend()
    if spec.attn_impl == "fused" and platform == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": "24576"}
    return None


class QuantDense(nn.Module):
    """Drop-in nn.Dense with the int8 MXU path — identical param layout
    ({kernel, bias}), so f32 engines load unchanged (weights quantize per
    forward; use QuantDensePre for production)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from yolov8_vit_tpu.ops.quant import quant_dense
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return quant_dense(x, kernel, bias).astype(self.dtype)


class QuantDensePre(nn.Module):
    """int8 dense over pre-quantized params {kernel_i8, w_scale, bias}
    (produced by ops.quant.prequantize_tree from an f32 engine)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from yolov8_vit_tpu.ops.quant import quant_dense_fused
        k = self.param("kernel_i8",
                       lambda _rng, shape: jnp.zeros(shape, jnp.int8),
                       (x.shape[-1], self.features))
        s = self.param("w_scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return quant_dense_fused(x, k, s, b).astype(self.dtype)


class _QuantParams(nn.Module):
    """Declares QuantDensePre-layout params without computing — lets the
    Block feed both MLP layers into one fused kernel while keeping the
    pytree paths identical to per-layer modules."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel_i8",
                       lambda _rng, shape: jnp.zeros(shape, jnp.int8),
                       (in_features, self.features))
        s = self.param("w_scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, s, b


def _dense(spec: "ViTSpec", features: int, dtype, name: str):
    # "w8"/"w8a" quantize via the fused kernels in Block; a layer-wise
    # QuantDense attention measured slower than bf16 (the win needed the
    # in-kernel post-LN quantization of "w8a", docs/performance.md round 2)
    cls = nn.Dense if spec.quant in ("none", "w8", "w8a") else QuantDense
    return cls(features, dtype=dtype, name=name)


class _LNParams(nn.Module):
    """Declares LayerNorm-layout params ({scale, bias}) without computing,
    so the fused attention kernel keeps checkpoint-identical pytrees."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           self.shape),
                self.param("bias", nn.initializers.zeros, (self.shape[-1],)))


class _AttnParams(nn.Module):
    """qkv/proj param shells under the same scope names as `Attention`."""
    dim: int

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams((self.dim, 3 * self.dim), name="qkv")()
        wp, bp = _DenseParams((self.dim, self.dim), name="proj")()
        return wq, bq, wp, bp


class _AttnParamsI8(nn.Module):
    """qkv/proj shells in the pre-quantized {kernel_i8, w_scale, bias}
    layout (ops.quant.prequantize_tree with the attention suffixes)."""
    dim: int

    @nn.compact
    def __call__(self):
        kq, sq, bq = _QuantParams(3 * self.dim, name="qkv")(self.dim)
        kp, sp, bp = _QuantParams(self.dim, name="proj")(self.dim)
        return kq, sq, bq, kp, sp, bp


class Attention(nn.Module):
    spec: ViTSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.spec
        b, t, d = x.shape
        head_dim = d // s.heads
        qkv = _dense(s, 3 * d, self.dtype, "qkv")(x)
        qkv = qkv.reshape(b, t, 3, s.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if s.attn_impl == "pallas":
            from yolov8_vit_tpu.ops.attention import flash_attention
            out = flash_attention(q, k, v).astype(self.dtype)
        else:
            scale = head_dim ** -0.5
            attn = jnp.einsum("bqhc,bkhc->bhqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            if s.pad_tokens and t > s.tokens:
                col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, 3)
                attn = jnp.where(col < s.tokens, attn, -jnp.inf)
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhc->bqhc", attn, v,
                             preferred_element_type=jnp.float32
                             ).astype(self.dtype)
        out = out.reshape(b, t, d)
        return _dense(s, d, self.dtype, "proj")(out)


class Block(nn.Module):
    spec: ViTSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.spec
        # lane-padded sequence: mask padded keys inside the sdpa
        t_real = s.tokens if (s.pad_tokens and x.shape[1] > s.tokens) \
            else None
        if s.attn_impl == "fused" and s.quant == "w8a":
            # int8 QKV/proj inside the fused attention kernel; params in the
            # pre-quantized layout (prequantize_tree, attention suffixes)
            from yolov8_vit_tpu.ops.attention import fused_attention_block_i8
            ns, nb = _LNParams(s.dim, name="norm1")()
            kq, sq, bq, kp, sp, bp = _AttnParamsI8(s.dim, name="attn")()
            x = fused_attention_block_i8(x, ns, nb, kq, sq, bq, kp, sp, bp,
                                         heads=s.heads, ln_eps=s.ln_eps,
                                         t_real=t_real)
        elif s.attn_impl == "fused":
            # whole attention sub-block (LN1+qkv+sdpa+proj+residual) in one
            # Pallas program; param tree identical to the module path below
            from yolov8_vit_tpu.ops.attention import fused_attention_block
            ns, nb = _LNParams(s.dim, name="norm1")()
            wq, bq, wp, bp = _AttnParams(s.dim, name="attn")()
            x = fused_attention_block(x, ns, nb, wq, bq, wp, bp,
                                      heads=s.heads, ln_eps=s.ln_eps,
                                      t_real=t_real)
        else:
            h = nn.LayerNorm(epsilon=s.ln_eps, dtype=self.dtype,
                             name="norm1")(x)
            x = x + Attention(s, dtype=self.dtype, name="attn")(h)
        hidden = int(s.dim * s.mlp_ratio)
        if s.quant in ("w8", "w8a"):
            # LN2 fused into the int8 MLP kernel (one read of the residual
            # stream); param tree identical to the module path below
            from yolov8_vit_tpu.ops.quant import quant_mlp_ln_fused
            ns, nb = _LNParams(s.dim, name="norm2")()
            k1, s1, b1 = _QuantParams(hidden, name="mlp_fc1")(s.dim)
            k2, s2, b2 = _QuantParams(s.dim, name="mlp_fc2")(hidden)
            return quant_mlp_ln_fused(x, ns, nb, k1, s1, b1, k2, s2, b2,
                                      ln_eps=s.ln_eps)
        h = nn.LayerNorm(epsilon=s.ln_eps, dtype=self.dtype, name="norm2")(x)
        h = _dense(s, hidden, self.dtype, "mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = _dense(s, s.dim, self.dtype, "mlp_fc2")(h)
        return x + h


class ViT(nn.Module):
    """Backbone + timm-style classifier head (the `model` in the wrapper)."""
    spec: ViTSpec = VIT_B8_224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        """img: (B, H, W, 3) float in [-1, 1] -> (B, backbone_classes) logits.

        A 4-D input of shape (B, n_patches, patch, patch*3) is treated as
        pre-blocked patch pixels (ops.crop.crop_to_patches layout, same
        normalization): patchify runs as one dot_general contracting the
        (u, (v, c)) dims on the SAME patch_embed params — no conv-im2col
        relayout (0.21 -> 0.03 ms for 32 crops)."""
        s = self.spec
        b = img.shape[0]
        if img.ndim == 4 and img.shape[-1] == s.patch * 3 \
                and img.shape[-2] == s.patch:
            # HWIO conv-layout {kernel, bias} under the conv's scope name,
            # so the matmul patchify path loads conv checkpoints unchanged
            k, bias = _DenseParams((s.patch, s.patch, 3, s.dim),
                                   name="patch_embed")()
            w = k.reshape(s.patch, s.patch * 3, s.dim)
            if img.dtype == jnp.int8:
                # ops.crop.crop_to_patches_i8 layout: values are pixel-128.
                # The [-1,1] normalization (pixel-127.5)/127.5 = (v+0.5)/127.5
                # folds into the embed: x@(W/127.5) + (sum(W)/255 + bias) —
                # no float pass over the crops anywhere.
                w = w / jnp.float32(127.5)
                bias = bias + jnp.sum(k, axis=(0, 1, 2)) / jnp.float32(255.0)
            x = (jax.lax.dot_general(
                img.astype(self.dtype), w.astype(self.dtype),
                (((2, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
                 + bias).astype(self.dtype)
        else:
            x = nn.Conv(s.dim, kernel_size=(s.patch, s.patch),
                        strides=(s.patch, s.patch), padding="VALID",
                        dtype=self.dtype, name="patch_embed")(img)
        x = x.reshape(b, -1, s.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, s.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, s.dim)).astype(x.dtype), x],
                            axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02), (1, s.tokens, s.dim))
        x = x + pos.astype(x.dtype)
        if s.pad_tokens and s.pad_tokens > s.tokens:
            # lane-pad once; blocks mask the padded keys (spec docstring).
            # Zero rows stay bounded through LN/MLP (row-local) and the
            # cls-token read below never touches them.
            x = jnp.pad(x, ((0, 0), (0, s.pad_tokens - s.tokens), (0, 0)))
        for i in range(s.depth):
            x = Block(s, dtype=self.dtype, name=f"block{i}")(x)
        # classifier reads only the cls token, and LayerNorm is per-token:
        # slice BEFORE the final norm so the (B, T, D) norm collapses to
        # (B, D) — identical output, one fewer full-sequence VPU pass
        x = nn.LayerNorm(epsilon=s.ln_eps, dtype=self.dtype, name="norm")(x[:, 0])
        return nn.Dense(s.backbone_classes, dtype=self.dtype, name="head")(x)


class ViTClassifier(nn.Module):
    """Network_Wrapper parity: backbone logits -> ReLU -> 128 -> ReLU -> nc.

    (`/root/reference/utils/utils.py:62-69`)
    """
    spec: ViTSpec = VIT_B8_224
    num_classes: int = 5
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        feats = ViT(self.spec, dtype=self.dtype, name="model")(img)
        h = nn.relu(feats)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(h)
