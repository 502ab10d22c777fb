"""int8 W8A8 quantization: op-level error bounds + ViT logits stability."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.ops.quant import quantize_weight, quantize_act, quant_dense


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    w_i8, s = quantize_weight(jnp.asarray(w))
    w_hat = np.asarray(w_i8, np.float32) * np.asarray(s)[None, :]
    # per-channel symmetric: error <= scale/2 per element
    assert np.abs(w_hat - w).max() <= np.asarray(s).max() / 2 + 1e-7


def test_act_quant_per_row():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 64)).astype(np.float32) * \
        np.logspace(-2, 2, 8)[:, None].astype(np.float32)  # wild row scales
    x_i8, s = quantize_act(jnp.asarray(x))
    x_hat = np.asarray(x_i8, np.float32) * np.asarray(s)
    rel = np.abs(x_hat - x).max(axis=1) / np.abs(x).max(axis=1)
    assert rel.max() < 1 / 127  # per-row scaling keeps rows independent


def test_quant_dense_close_to_f32():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 128)).astype(np.float32)
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.05
    b = rng.normal(size=(64,)).astype(np.float32) * 0.1
    ref = x @ w + b
    got = np.asarray(quant_dense(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b)))
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02


def test_quant_vit_logits_close_and_argmax_stable():
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)
    qspec = dataclasses.replace(spec, quant="dynamic")
    m = ViTClassifier(spec, 5)
    q = ViTClassifier(qspec, 5)
    params = jax.jit(m.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    ref = np.asarray(m.apply(params, x))
    got = np.asarray(q.apply(params, x))
    # quantization noise stays small relative to logit spread
    spread = ref.max() - ref.min() + 1e-6
    assert np.abs(got - ref).max() / spread < 0.15
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_fused_mlp_matches_unfused_math():
    """quant_mlp_fused == quantize -> int8 fc1 -> tanh-gelu -> quantize ->
    int8 fc2 -> +res composed from the unfused ops."""
    from yolov8_vit_tpu.ops.quant import (quantize_weight, quant_dense_pre,
                                          quant_mlp_fused)
    rng = np.random.default_rng(5)
    m, d, hid = 48, 64, 256
    h = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    w1, b1 = rng.normal(size=(d, hid)).astype(np.float32) * 0.1, \
        rng.normal(size=(hid,)).astype(np.float32) * 0.1
    w2, b2 = rng.normal(size=(hid, d)).astype(np.float32) * 0.1, \
        rng.normal(size=(d,)).astype(np.float32) * 0.1
    w1q, s1 = quantize_weight(jnp.asarray(w1))
    w2q, s2 = quantize_weight(jnp.asarray(w2))

    a = quant_dense_pre(h, w1q, s1, jnp.asarray(b1))
    a = jax.nn.gelu(a, approximate=True)
    ref = res + quant_dense_pre(a, w2q, s2, jnp.asarray(b2))
    got = quant_mlp_fused(h, res, w1q, s1, jnp.asarray(b1), w2q, s2,
                          jnp.asarray(b2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_w8_vit_close_to_f32():
    """quant='w8' (fused int8 MLP, f32 attention) tracks the f32 model."""
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    from yolov8_vit_tpu.ops.quant import prequantize_tree
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)
    f32 = ViTClassifier(spec, 5)
    w8 = ViTClassifier(dataclasses.replace(spec, quant="w8"), 5)
    params = jax.jit(f32.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    qparams = prequantize_tree(params)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    a = np.asarray(f32.apply(params, x))
    b = np.asarray(w8.apply(qparams, x))
    spread = a.max() - a.min() + 1e-6
    assert np.abs(b - a).max() / spread < 0.15
    np.testing.assert_array_equal(b.argmax(-1), a.argmax(-1))


def test_quant_dense_fused_silu_epilogue():
    """silu=True fuses the conv-style SiLU into the W8A8 kernel: output ==
    silu(quant_dense_pre(x, w)) (bit-identical quantization path)."""
    from yolov8_vit_tpu.ops.quant import (quantize_weight, quant_dense_pre,
                                          quant_dense_fused)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(300, 96)), jnp.float32)  # pads to 512
    w = jnp.asarray(rng.normal(size=(96, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    wi8, ws = quantize_weight(w)
    ref = quant_dense_pre(x, wi8, ws, b)
    ref = ref * jax.nn.sigmoid(ref)
    got = quant_dense_fused(x, wi8, ws, b, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
