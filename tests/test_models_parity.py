"""Cross-check flax models + converters vs independent torch references
(SURVEY.md §4 plan (b): logit tolerance on ViT, head-map tolerance on YOLO).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOv8Spec
from yolov8_vit_tpu.runtime.convert import convert_vit_wrapper, convert_yolov8

from torch_refs import TimmViT, NetworkWrapper, UYOLOv8

TINY_VIT = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)
TINY_DET = YOLOv8Spec(depth=0.33, width=0.125, max_channels=1024,
                      num_classes=5)


def _randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so folding is exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


def test_vit_wrapper_matches_torch():
    torch.manual_seed(0)
    tmodel = NetworkWrapper(
        TimmViT(img_size=32, patch=8, dim=64, depth=2, heads=4,
                num_classes=40), 5, backbone_classes=40).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_vit_wrapper(sd, depth=2)

    x = np.random.default_rng(0).normal(size=(3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    model = ViTClassifier(TINY_VIT, 5)
    ours = np.asarray(jax.jit(model.apply)(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    # XLA-CPU (oneDNN) reorders accumulations vs torch; amplified through
    # the LN/attention stack this reaches ~1e-3 abs on tiny nets.
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_yolov8_matches_torch():
    torch.manual_seed(1)
    tmodel = UYOLOv8(TINY_DET, num_classes=5).eval()
    _randomize_bn_stats(tmodel, seed=1)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_yolov8(sd)

    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_levels = tmodel(torch.from_numpy(x))

    model = YOLOv8(TINY_DET, fused=True)
    ours_levels = jax.jit(model.apply)(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert len(ours_levels) == len(ref_levels) == 3
    for lvl, ((ob, oc), (rb, rc)) in enumerate(zip(ours_levels, ref_levels)):
        np.testing.assert_allclose(
            np.asarray(ob), rb.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-3, err_msg=f"box level {lvl}")
        np.testing.assert_allclose(
            np.asarray(oc), rc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-3, err_msg=f"cls level {lvl}")


def test_yolov8_param_count_variants():
    """yolov8n at 5 classes should land at ~3.0M params (ultralytics scale)."""
    from yolov8_vit_tpu.models.yolov8 import YOLOV8_VARIANTS
    spec = dataclasses.replace(YOLOV8_VARIANTS["n"], num_classes=5)
    det = YOLOv8(spec, fused=True)
    pd = jax.eval_shape(det.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(pd))
    assert 2.8e6 < n < 3.3e6, n


def test_vit_b8_param_count():
    """ViT-B/8 backbone+head ~86.6M + wrapper head."""
    model = ViTClassifier(ViTSpec(), 5)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    # timm vit_base_patch8_224 w/ 1000-class head = 86.6M; wrapper adds 128*1001+5*129
    assert 86e6 < n < 88e6, n


def test_make_divisible_matches_ultralytics():
    """Channel-width rounding is ceil-based in ultralytics
    (ultralytics/utils/ops.py::make_divisible); round-to-nearest diverges
    for custom width scales (e.g. width 0.3: 64*0.3=19.2 -> 24, not 16),
    breaking checkpoint round-trips for non-named variants.  The named
    n/s/m/l/x variants all land on multiples of 8 and mask the bug."""
    import math
    from yolov8_vit_tpu.models.yolov8 import _make_divisible

    for x in (19.2, 3.0, 8.0, 12.8, 76.8, 153.6, 1.0, 0.5):
        assert _make_divisible(x) == max(8, math.ceil(x / 8) * 8)
