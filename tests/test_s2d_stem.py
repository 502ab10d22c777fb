"""Space-to-depth letterbox + stem: bit-equivalence with the standard path."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOv8Spec
from yolov8_vit_tpu.ops.letterbox import letterbox, letterbox_s2d

TINY = YOLOv8Spec(0.33, 0.125, 1024, num_classes=5)


def test_letterbox_s2d_matches_letterbox():
    """Cells == letterbox canvas (114 bands inside) + ZERO conv ring."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (2, 48, 80, 3), dtype=np.uint8))
    cells, r, dwdh = letterbox_s2d(img, (64, 64), dtype=jnp.float32)
    ref, r2, dwdh2 = letterbox(img.astype(jnp.float32), (64, 64))
    assert r == r2 and dwdh == dwdh2
    padded = np.pad(np.asarray(ref), ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=0.0)   # the conv's zero ring
    b = 2
    ref_cells = padded.reshape(b, 33, 2, 33, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, 33, 33, 12)
    np.testing.assert_allclose(np.asarray(cells), ref_cells, atol=1e-4)


def test_s2d_stem_layer_exact_at_borders():
    """Direct stem-layer comparison — border rows included.  (The net-level
    test alone attenuates first-layer border errors through random tiny
    weights; this one caught the 114-vs-0 ring bug.)"""
    from yolov8_vit_tpu.models.yolov8 import ConvBlock, S2DStem
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8))
    std = ConvBlock(8, 3, 2, fused=True)
    params = std.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    lb, _, _ = letterbox(img.astype(jnp.float32), (64, 64))
    out_std = np.asarray(std.apply(params, lb / 255.0))
    cells, _, _ = letterbox_s2d(img, (64, 64), dtype=jnp.float32)
    out_s2d = np.asarray(S2DStem(8).apply(params, cells / 255.0))
    np.testing.assert_allclose(out_s2d, out_std, rtol=1e-4, atol=1e-5)


def test_s2d_stem_detector_matches_standard():
    """Same params through both stems -> identical head outputs."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    std = YOLOv8(TINY, fused=True, stem_s2d=False)
    s2d = YOLOv8(TINY, fused=True, stem_s2d=True)
    params = jax.jit(std.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))

    lb, _, _ = letterbox(img.astype(jnp.float32), (64, 64))
    out_std = std.apply(params, lb / 255.0)
    cells, _, _ = letterbox_s2d(img, (64, 64), dtype=jnp.float32)
    out_s2d = s2d.apply(params, cells / 255.0)

    for (b1, c1), (b2, c2) in zip(out_std, out_s2d):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-4, atol=1e-4)


def test_pipeline_s2d_matches_standard():
    cfg = DetectConfig(input_size=(64, 64), variant="n", nms_pre_topk=64,
                       nms_topk=16)
    vit = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                  backbone_classes=16)
    p_std = TwoStagePipeline(det_cfg=cfg, vit_spec=vit, classify_budget=2,
                             stem_mode="flat")
    p_s2d = TwoStagePipeline(det_cfg=cfg, vit_spec=vit, classify_budget=2,
                             stem_mode="s2d")
    params = jax.jit(p_std.init_params)(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (2, 48, 80, 3), dtype=np.uint8))
    a = jax.tree.map(np.asarray, p_std(params, imgs))
    b = jax.tree.map(np.asarray, p_s2d(params, imgs))
    np.testing.assert_array_equal(a["num_dets"], b["num_dets"])
    np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(a["det_scores"], b["det_scores"],
                               rtol=1e-3, atol=1e-4)
    # random-weight logits sit at near-ties; einsum summation order may flip
    # argmax on the tail — require exact agreement on the top-3 detections
    np.testing.assert_array_equal(a["det_labels"][:, :3],
                                  b["det_labels"][:, :3])
