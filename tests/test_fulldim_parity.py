"""FULL-DIMENSION forward parity vs torch at the production shapes.

The e2e parity gate (test_e2e_parity.py) runs the whole two-stage flow at
toy shapes (64px detect, 32px ViT); structural checks (param counts,
state-dict manifests) cover full scale but cannot see scale-dependent
numerical bugs — wrong padding at 640, stride mix-ups, reshape order at
785 tokens.  This closes that window (round-4 VERDICT item 4): one f32
random-weight forward of yolov8s@640 (all three head levels) and
ViT-B/8@224 — the reference's deployed models
(`/root/reference/utils/utils.py:59-87`, `/root/reference/tech.md:39-47`,
`/root/reference/utils/class_config.py:21`) — through the torch->flax
converters, tolerance-asserted against tests/torch_refs.py.

CPU-heavy (one yolov8s@640 + one ViT-B/8@224 compile, cached after the
first run); kept in the default suite because it is the only full-scale
numerical gate.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
from yolov8_vit_tpu.models.yolov8 import (YOLOv8, YOLOV8_VARIANTS,
                                          flatten_head_outputs)
from yolov8_vit_tpu.runtime.convert import convert_yolov8, convert_vit_wrapper

from torch_refs import UYOLOv8, TimmViT, NetworkWrapper


def test_yolov8s_640_forward_matches_torch():
    """yolov8s @ (1, 640, 640, 3) f32: every head level's box-distribution
    and class-logit maps must match the torch formulation through
    convert_yolov8 (BN folding included — stats randomized so folding
    mistakes cannot hide behind identity running stats)."""
    torch.manual_seed(0)
    spec = YOLOV8_VARIANTS["s"].__class__(
        **{**YOLOV8_VARIANTS["s"].__dict__, "num_classes": 5})
    det_t = UYOLOv8(spec, num_classes=5).eval()
    g = torch.Generator().manual_seed(0)
    for m in det_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)

    params = convert_yolov8(
        {k: v.numpy() for k, v in det_t.state_dict().items()})
    model = YOLOv8(spec, fused=True)

    rng = np.random.default_rng(1)
    blob = rng.random((1, 640, 640, 3)).astype(np.float32)
    with torch.no_grad():
        ref_levels = det_t(torch.from_numpy(
            blob.transpose(0, 3, 1, 2).copy()))
    # true-f32 matmul accumulation so CPU/TPU agree with torch's f32 convs
    with jax.default_matmul_precision("highest"):
        ours = jax.jit(model.apply)(params, jnp.asarray(blob))

    assert len(ours) == 3 == len(ref_levels)
    for lvl, ((bd_j, cl_j), (bd_t, cl_t)) in enumerate(zip(ours, ref_levels)):
        bd_t = bd_t.permute(0, 2, 3, 1).numpy()     # NCHW -> NHWC
        cl_t = cl_t.permute(0, 2, 3, 1).numpy()
        assert bd_j.shape == bd_t.shape, (lvl, bd_j.shape, bd_t.shape)
        assert cl_j.shape == cl_t.shape, (lvl, cl_j.shape, cl_t.shape)
        # scale-aware: values are pre-DFL distributions / pre-sigmoid
        # logits, O(1-10); fp error grows with depth (P5 is deepest)
        np.testing.assert_allclose(np.asarray(bd_j), bd_t, atol=2e-3,
                                   rtol=1e-3, err_msg=f"box level {lvl}")
        np.testing.assert_allclose(np.asarray(cl_j), cl_t, atol=2e-3,
                                   rtol=1e-3, err_msg=f"cls level {lvl}")

    # the flattened (decode-input) view must agree too: anchor ordering
    # bugs (level-major, row-major, x fastest) are invisible per-level
    box_f, cls_f = flatten_head_outputs(ours)
    ref_box = np.concatenate([
        lv[0].permute(0, 2, 3, 1).reshape(1, -1, 64).numpy()
        for lv in ref_levels], axis=1)
    assert box_f.shape == ref_box.shape == (1, 8400, 64)
    np.testing.assert_allclose(np.asarray(box_f), ref_box, atol=2e-3,
                               rtol=1e-3)


def test_vit_b8_224_forward_matches_torch():
    """ViT-B/8 @ (1, 224, 224, 3) f32 — the reference's deployed classifier
    (785 tokens): logits through convert_vit_wrapper must match the timm
    formulation."""
    torch.manual_seed(2)
    vit_t = NetworkWrapper(
        TimmViT(img_size=224, patch=8, dim=768, depth=12, heads=12,
                num_classes=1000),
        5, backbone_classes=1000).eval()
    params = convert_vit_wrapper(
        {k: v.numpy() for k, v in vit_t.state_dict().items()}, depth=12)

    spec = ViTSpec()        # defaults ARE B/8 224 (the deployed config)
    assert (spec.img_size, spec.patch, spec.dim, spec.depth) == \
        (224, 8, 768, 12)
    model = ViTClassifier(spec, 5)

    rng = np.random.default_rng(3)
    x = (rng.random((1, 224, 224, 3)).astype(np.float32) * 2.0) - 1.0
    with torch.no_grad():
        ref = vit_t(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))

    assert ours.shape == ref.shape == (1, 5)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_vit_b16_224_forward_matches_torch():
    """ViT-B/16 @ (1, 224, 224, 3) f32 — the headline bench classifier
    (197 tokens; BASELINE config #3 names B/16): logits through
    convert_vit_wrapper must match the timm formulation at full scale."""
    torch.manual_seed(4)
    vit_t = NetworkWrapper(
        TimmViT(img_size=224, patch=16, dim=768, depth=12, heads=12,
                num_classes=1000),
        5, backbone_classes=1000).eval()
    params = convert_vit_wrapper(
        {k: v.numpy() for k, v in vit_t.state_dict().items()}, depth=12)
    model = ViTClassifier(ViTSpec(patch=16), 5)

    rng = np.random.default_rng(5)
    x = (rng.random((1, 224, 224, 3)).astype(np.float32) * 2.0) - 1.0
    with torch.no_grad():
        ref = vit_t(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 5)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
