"""Lane-padded ViT sequences (ViTSpec.pad_tokens): the cls-token output
must be unchanged — padded keys are masked to -inf inside the sdpa, padded
rows are row-local everywhere else and the final cls slice never reads
them.  ViT-B/8's 785-token sequence pads to 896 in production
(`/root/reference/utils/class_config.py:21` is the reference's deployed
B/8 classifier; this is its TPU lane-alignment)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec


def _spec(**kw):
    return ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40, **kw)


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_padded_matches_unpadded(impl):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 32, 32, 3)), jnp.float32)
    spec = _spec(attn_impl=impl)
    specp = dataclasses.replace(spec, pad_tokens=24)   # 17 real tokens
    m, mp = ViTClassifier(spec, 5), ViTClassifier(specp, 5)
    p = m.init(jax.random.PRNGKey(0), x)     # param tree is pad-agnostic
    a = np.asarray(m.apply(p, x))
    b = np.asarray(mp.apply(p, x))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_padded_matches_unpadded_w8a():
    from yolov8_vit_tpu.ops.quant import (MLP_AND_ATTN_SUFFIXES,
                                          prequantize_tree)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    spec = _spec(attn_impl="fused", quant="w8a")
    specp = dataclasses.replace(spec, pad_tokens=32)
    m, mp = ViTClassifier(spec, 5), ViTClassifier(specp, 5)
    base = ViTClassifier(_spec(), 5).init(jax.random.PRNGKey(1), x)
    params = prequantize_tree(base, MLP_AND_ATTN_SUFFIXES)
    a = np.asarray(m.apply(params, x))
    b = np.asarray(mp.apply(params, x))
    np.testing.assert_allclose(a, b, atol=1e-4)
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_spec_validation():
    with pytest.raises(ValueError, match="pad_tokens"):
        _spec(pad_tokens=8)          # below the 17-token sequence
    with pytest.raises(ValueError, match="pad_tokens"):
        _spec(attn_impl="pallas", pad_tokens=24)
    assert _spec(pad_tokens=24).seq_len == 24
    assert _spec().seq_len == _spec().tokens == 17


def test_vit_compiler_options_gating():
    """The scoped-VMEM raise applies to EVERY fused-attention spec on the
    TPU backend (the CPU backend rejects TPU flags).  The VMEM edge moves
    with the crop-grid length, which the spec cannot see, so the gate is
    impl-based: round-4 sweeps OOMed B/8 at a 128-crop grid and even B/16
    (t=197) at a 512-crop dense-serve grid."""
    from unittest import mock
    from yolov8_vit_tpu.models.vit import vit_compiler_options
    spec = ViTSpec(patch=8, attn_impl="fused", pad_tokens=896)
    # CPU backend (the test env): always None
    assert vit_compiler_options(spec) is None
    assert vit_compiler_options(ViTSpec(patch=16)) is None
    with mock.patch("jax.default_backend", return_value="tpu"):
        for s in (spec,
                  ViTSpec(patch=8, attn_impl="fused"),          # t=785
                  ViTSpec(patch=16, attn_impl="fused"),         # t=197
                  ViTSpec(patch=16, attn_impl="fused",
                          img_size=384)):                        # t=577
            assert vit_compiler_options(s) == {
                "xla_tpu_scoped_vmem_limit_kib": "24576"}
        # non-fused paths stay at the default limit
        assert vit_compiler_options(ViTSpec(patch=8)) is None    # xla attn
        assert vit_compiler_options(ViTSpec(patch=16)) is None   # xla attn
