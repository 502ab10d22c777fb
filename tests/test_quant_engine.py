"""Quantized classify engines round-trip through Engine + the pipeline."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
from yolov8_vit_tpu.ops.quant import prequantize_tree
from yolov8_vit_tpu.runtime.engine import Engine, save_engine


def test_w8_engine_roundtrip(tmp_path):
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)
    f32 = ViTClassifier(spec, 5)
    params = jax.jit(f32.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    qspec = dataclasses.replace(spec, quant="w8")
    qparams = prequantize_tree(params)
    d = str(tmp_path / "qeng")
    save_engine(d, "classify", qparams,
                {"vit_spec": dataclasses.asdict(qspec), "num_classes": 5})
    eng = Engine(d)
    x = np.random.default_rng(0).random((2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(eng(x))
    ref = np.asarray(f32.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == (2, 5)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
    # int8 kernels survived serialization
    leaf = eng.params["params"]["model"]["block0"]["mlp_fc1"]["kernel_i8"]
    assert leaf.dtype == jnp.int8
