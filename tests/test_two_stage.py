"""Fused two-stage pipeline: shape contract, masking, and end-to-end flow
on tiny models (SURVEY.md §7 step 6)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
from yolov8_vit_tpu.models.vit import ViTSpec

TINY_DET_CFG = DetectConfig(input_size=(64, 64), variant="n", nms_pre_topk=64,
                            nms_topk=16)
TINY_VIT = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)


@pytest.fixture(scope="module")
def pipe_and_params():
    pipe = TwoStagePipeline(det_cfg=TINY_DET_CFG, vit_spec=TINY_VIT,
                            classify_budget=4)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    return pipe, params


def test_output_contract(pipe_and_params):
    pipe, params = pipe_and_params
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, 96, 128, 3), dtype=np.uint8))
    out = jax.jit(pipe.__call__)(params, imgs)
    t = TINY_DET_CFG.nms_topk
    assert out["num_dets"].shape == (2,)
    assert out["boxes"].shape == (2, t, 4)
    assert out["det_scores"].shape == (2, t)
    assert out["det_labels"].shape == (2, t)
    assert out["final_valid"].shape == (2, t)
    assert out["cls_labels"].shape == (2, t)
    assert out["cls_scores"].shape == (2, t)

    boxes = np.asarray(out["boxes"])
    assert (boxes[..., 0] >= 0).all() and (boxes[..., 2] <= 128).all()
    assert (boxes[..., 1] >= 0).all() and (boxes[..., 3] <= 96).all()

    # every classified slot must be a final_valid slot
    cls = np.asarray(out["cls_labels"])
    fv = np.asarray(out["final_valid"])
    assert ((cls >= 0) <= fv).all()


def test_classified_slots_get_probabilities(pipe_and_params):
    pipe, params = pipe_and_params
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (1, 64, 64, 3), dtype=np.uint8))
    out = pipe(params, imgs)
    cls = np.asarray(out["cls_labels"][0])
    sc = np.asarray(out["cls_scores"][0])
    for i in range(len(cls)):
        if cls[i] >= 0:
            assert 0.0 < sc[i] <= 1.0
        else:
            assert sc[i] == 0.0


def test_budget_compaction_caps_classification(pipe_and_params):
    pipe, params = pipe_and_params
    imgs = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (2, 64, 64, 3), dtype=np.uint8))
    out = pipe(params, imgs)
    n_classified = int((np.asarray(out["cls_labels"]) >= 0).sum())
    assert n_classified <= 2 * pipe.classify_budget


def test_budget_fallback_rate_at_realistic_densities():
    """Round-1 weakness: how often does budget overflow force stage-1-label
    fallback?  Model detection counts per frame with the production
    assumption (manhole scenes average ~1-2 covers): for Poisson(lam)
    frame densities at batch 8, budget 4 gives 32 classify slots shared
    across the batch — overflow needs >32 total detections in one batch.
    This computes the exact overflow probability by simulation and pins
    the engineering claim in docs/performance.md."""
    rng = np.random.default_rng(0)
    batch, budget = 8, 4
    slots = batch * budget
    for lam, max_rate in [(1.5, 1e-4), (3.0, 0.06)]:
        counts = rng.poisson(lam, size=(200_000, batch)).sum(1)
        overflow = float((counts > slots).mean())
        assert overflow <= max_rate, (lam, overflow)
    # and when overflow DOES happen, the lowest-confidence detections are
    # the ones that fall back (priority = validity then score)
    # -> exercised concretely: force 3 valid finals into budget 2x1
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec
    cfg = DetectConfig(input_size=(64, 64), variant="n", nms_pre_topk=64,
                       nms_topk=16, nms_conf=1e-6, conf_second=1e-6,
                       custom_nms_iou=0.9999)
    pipe = TwoStagePipeline(det_cfg=cfg,
                            vit_spec=ViTSpec(img_size=32, patch=8, dim=64,
                                             depth=1, heads=4,
                                             backbone_classes=16),
                            classify_budget=2, dtype=jnp.float32)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (1, 48, 80, 3), dtype=np.uint8))
    out = jax.tree.map(np.asarray, jax.jit(pipe.__call__)(params, img))
    finals = np.nonzero(out["final_valid"][0])[0]
    if len(finals) > 2:                      # overflow occurred
        classified = [k for k in finals if out["cls_labels"][0][k] >= 0]
        dropped = [k for k in finals if out["cls_labels"][0][k] < 0]
        assert len(classified) == 2
        # every classified final outranks every dropped one by det score
        assert min(out["det_scores"][0][k] for k in classified) >= \
            max(out["det_scores"][0][k] for k in dropped)
