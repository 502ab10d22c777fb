"""Fused attention sub-block kernel parity (ops/attention.py).

The inference path runs LN1 + fused-QKV + per-head SDPA + proj + residual
as one Pallas program (attn_impl="fused").  These tests pin it against the
module-composed XLA path: identical param tree, f32-exact logits, and
argmax-stable under the int8-MLP engine config.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
from yolov8_vit_tpu.ops.attention import fused_attention_block


def _specs(**kw):
    base = dict(img_size=32, patch=8, dim=64, depth=2, heads=4,
                backbone_classes=40)
    base.update(kw)
    return (ViTSpec(**base), ViTSpec(**base, attn_impl="fused"))


def test_param_tree_identical():
    s_x, s_f = _specs()
    x = jnp.zeros((1, 32, 32, 3))
    px = jax.eval_shape(ViTClassifier(s_x, 5).init, jax.random.PRNGKey(0), x)
    pf = jax.eval_shape(ViTClassifier(s_f, 5).init, jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(px) == \
        jax.tree_util.tree_structure(pf)
    assert jax.tree.map(lambda a, b: a.shape == b.shape, px, pf)


@pytest.mark.parametrize("tokens_cfg", [dict(), dict(img_size=48, patch=16)])
def test_fused_matches_xla_f32(tokens_cfg):
    s_x, s_f = _specs(**tokens_cfg)
    sz = s_x.img_size
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, sz, sz, 3)),
                    jnp.float32)
    p = jax.jit(ViTClassifier(s_x, 5).init)(jax.random.PRNGKey(0), x)
    a = np.asarray(ViTClassifier(s_x, 5).apply(p, x))
    b = np.asarray(ViTClassifier(s_f, 5).apply(p, x))
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_fused_op_direct_vs_reference():
    """Direct op-level check against a hand-rolled numpy attention block."""
    rng = np.random.default_rng(1)
    b, t, d, heads = 3, 17, 32, 4
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    lns = (1 + rng.normal(size=d) * 0.1).astype(np.float32)
    lnb = (rng.normal(size=d) * 0.1).astype(np.float32)
    wq = (rng.normal(size=(d, 3 * d)) * 0.1).astype(np.float32)
    bq = (rng.normal(size=3 * d) * 0.02).astype(np.float32)
    wp = (rng.normal(size=(d, d)) * 0.1).astype(np.float32)
    bp = (rng.normal(size=d) * 0.02).astype(np.float32)

    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    h = (x - mu) / np.sqrt(var + 1e-6) * lns + lnb
    qkv = h @ wq + bq
    hd = d // heads
    out = np.zeros_like(x)
    for bi in range(b):
        for hh in range(heads):
            q = qkv[bi, :, hh * hd:(hh + 1) * hd] * hd ** -0.5
            k = qkv[bi, :, d + hh * hd:d + (hh + 1) * hd]
            v = qkv[bi, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
            s = q @ k.T
            e = np.exp(s - s.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            out[bi, :, hh * hd:(hh + 1) * hd] = p @ v
    ref = x + out @ wp + bp

    got = np.asarray(fused_attention_block(
        jnp.asarray(x), jnp.asarray(lns), jnp.asarray(lnb), jnp.asarray(wq),
        jnp.asarray(bq), jnp.asarray(wp), jnp.asarray(bp), heads=heads))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_w8_argmax_stable():
    """Engine config (int8 MLP + fused attention) keeps f32 argmax."""
    base = dict(img_size=32, patch=8, dim=64, depth=2, heads=4,
                backbone_classes=40)
    s_ref = ViTSpec(**base)
    s_eng = ViTSpec(**base, attn_impl="fused", quant="w8")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    p = jax.jit(ViTClassifier(s_ref, 5).init)(jax.random.PRNGKey(1), x)
    from yolov8_vit_tpu.ops.quant import prequantize_tree
    logits_ref = np.asarray(ViTClassifier(s_ref, 5).apply(p, x))
    logits_eng = np.asarray(ViTClassifier(s_eng, 5).apply(
        prequantize_tree(p), x))
    assert (logits_ref.argmax(-1) == logits_eng.argmax(-1)).all()


def test_fused_w8a_attention_int8_argmax_stable():
    """quant='w8a' (int8 MLP + int8 QKV/proj in the fused attention kernel)
    keeps the f32 argmax and stays within quantization-noise bounds."""
    from yolov8_vit_tpu.ops.quant import (prequantize_tree,
                                          MLP_AND_ATTN_SUFFIXES)
    base = dict(img_size=32, patch=8, dim=64, depth=2, heads=4,
                backbone_classes=40)
    s_ref = ViTSpec(**base)
    s_eng = ViTSpec(**base, attn_impl="fused", quant="w8a")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    p = jax.jit(ViTClassifier(s_ref, 5).init)(jax.random.PRNGKey(1), x)
    logits_ref = np.asarray(ViTClassifier(s_ref, 5).apply(p, x))
    logits_eng = np.asarray(ViTClassifier(s_eng, 5).apply(
        prequantize_tree(p, MLP_AND_ATTN_SUFFIXES), x))
    spread = logits_ref.max() - logits_ref.min() + 1e-6
    assert np.abs(logits_eng - logits_ref).max() / spread < 0.15
    assert (logits_ref.argmax(-1) == logits_eng.argmax(-1)).all()


def test_fused_i8_op_matches_bf16_op():
    """fused_attention_block_i8 == fused_attention_block with quantized
    weights, to within the per-row int8 activation-quantization bound."""
    from yolov8_vit_tpu.ops.attention import fused_attention_block_i8
    from yolov8_vit_tpu.ops.quant import quantize_weight
    rng = np.random.default_rng(4)
    b, t, d, heads = 4, 17, 32, 4
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    lns = jnp.asarray(1 + rng.normal(size=d) * 0.1, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=d) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.normal(size=3 * d) * 0.02, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.normal(size=d) * 0.02, jnp.float32)
    ref = np.asarray(fused_attention_block(
        x, lns, lnb, wq, bq, wp, bp, heads=heads))
    kq, sq = quantize_weight(wq)
    kp, sp = quantize_weight(wp)
    got = np.asarray(fused_attention_block_i8(
        x, lns, lnb, kq, sq, bq, kp, sp, bp, heads=heads))
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.05
