"""Pallas fused attention vs the XLA reference formulation."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu.ops.attention import flash_attention


def _xla_attention(q, k, v):
    d = q.shape[-1]
    attn = jnp.einsum("bqhc,bkhc->bhqk", q * d ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkhc->bqhc", attn.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("t", [197, 785, 128, 64])
def test_flash_matches_xla(t):
    rng = np.random.default_rng(t)
    b, h, d = 2, 4, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
               for _ in range(3))
    ours = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(_xla_attention(q, k, v))
    # f32 accumulation-order noise grows with t; bf16 on-TPU delta is ~1e-3
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=2e-4)


def test_flash_padding_isolated():
    """Values in padded key slots must not leak: compare t vs t grown by
    junk rows that the mask should exclude."""
    rng = np.random.default_rng(0)
    b, t, h, d = 1, 100, 2, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
               for _ in range(3))
    base = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(_xla_attention(q, k, v))
    np.testing.assert_allclose(base, ref, rtol=2e-5, atol=2e-5)


def test_vit_with_pallas_attention_matches_xla_impl():
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    spec_x = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                     backbone_classes=40, attn_impl="xla")
    spec_p = dataclasses.replace(spec_x, attn_impl="pallas")
    mx = ViTClassifier(spec_x, 5)
    mp = ViTClassifier(spec_p, 5)
    params = jax.jit(mx.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(mp.apply(params, x)),
                               np.asarray(mx.apply(params, x)),
                               rtol=1e-4, atol=1e-4)
