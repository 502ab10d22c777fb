"""YOLOv8 loss semantics + end-to-end overfit test on a tiny detector."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from yolov8_vit_tpu.models.yolov8 import (YOLOv8, YOLOv8Spec,
                                          flatten_head_outputs)
from yolov8_vit_tpu.ops.dfl import make_anchors
from yolov8_vit_tpu.train.yolo_loss import (task_aligned_assign,
                                            yolo_detection_loss,
                                            pairwise_ciou, iou_matrix)

TINY = YOLOv8Spec(depth=0.33, width=0.125, max_channels=1024, num_classes=3)


def test_ciou_identity_and_disjoint():
    a = jnp.asarray([[10.0, 10, 50, 50]])
    assert float(pairwise_ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    b = jnp.asarray([[100.0, 100, 120, 120]])
    assert float(pairwise_ciou(a, b)[0]) < 0.0


def test_assignment_inside_box_only():
    hw = (32, 32)
    anchors, stride = make_anchors(hw)
    anchors_px = np.asarray(anchors * stride)
    a = anchors_px.shape[0]
    gt = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    labels = jnp.asarray([1])
    mask = jnp.asarray([True])
    scores = jnp.full((a, 3), 0.5)
    # perfect pred boxes = gt box at every anchor
    pred_boxes = jnp.broadcast_to(gt[0], (a, 4))
    fg, agt, tscore = task_aligned_assign(scores, pred_boxes,
                                          jnp.asarray(anchors_px), gt,
                                          labels, mask)
    fg = np.asarray(fg)
    inside = ((anchors_px[:, 0] > 8) & (anchors_px[:, 0] < 24) &
              (anchors_px[:, 1] > 8) & (anchors_px[:, 1] < 24))
    assert fg.sum() > 0
    assert not np.any(fg & ~inside)          # fg only inside the gt
    ts = np.asarray(tscore)
    assert ts[:, [0, 2]].sum() == 0          # only class 1 targeted
    assert ts.max() <= 1.0 + 1e-6


def test_assignment_respects_gt_mask():
    hw = (32, 32)
    anchors, stride = make_anchors(hw)
    a = anchors.shape[0]
    gt = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    fg, _, _ = task_aligned_assign(
        jnp.full((a, 3), 0.5), jnp.broadcast_to(gt[0], (a, 4)),
        anchors * stride, gt, jnp.asarray([1]), jnp.asarray([False]))
    assert not bool(np.asarray(fg).any())


def test_loss_finite_no_gt():
    """Images with zero boxes must yield finite cls-only loss."""
    b, hw = 2, (32, 32)
    anchors, _ = make_anchors(hw)
    a = anchors.shape[0]
    rng = np.random.default_rng(0)
    box_dist = jnp.asarray(rng.normal(size=(b, a, 64)), jnp.float32)
    cls_logits = jnp.asarray(rng.normal(size=(b, a, 3)), jnp.float32)
    gt = jnp.zeros((b, 4, 4))
    labels = jnp.zeros((b, 4), jnp.int32)
    mask = jnp.zeros((b, 4), bool)
    total, parts = yolo_detection_loss(box_dist, cls_logits, gt, labels,
                                       mask, hw)
    assert np.isfinite(float(total))
    assert float(parts["box"]) == 0.0


def test_tiny_detector_overfits_single_box():
    """60 Adam steps on one synthetic image: loss must drop substantially
    and the best pred box must land on the gt (the ultralytics-free training
    path actually learns; converges to IoU ~0.95 by step 60)."""
    hw = (64, 64)
    model = YOLOv8(TINY, fused=True)
    rng = np.random.default_rng(0)
    img = np.full((1, 64, 64, 3), 0.2, np.float32)
    img[0, 16:48, 8:40] = 1.0
    gt = jnp.asarray([[[8.0, 16.0, 40.0, 48.0]]])
    labels = jnp.asarray([[2]])
    mask = jnp.asarray([[True]])

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            bd, cl = flatten_head_outputs(model.apply(p, jnp.asarray(img)))
            total, parts = yolo_detection_loss(bd, cl, gt, labels, mask, hw)
            return total, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    # with the bias-init priors the starting loss is already low; the
    # meaningful convergence gate is the localization check below
    assert losses[-1] < losses[0] * 0.6, losses[:3] + losses[-3:]

    # decode best box
    from yolov8_vit_tpu.ops.dfl import dfl_decode
    bd, cl = flatten_head_outputs(model.apply(params, jnp.asarray(img)))
    anchors, stride = make_anchors(hw)
    boxes = dfl_decode(bd[0], anchors, stride)
    best = int(np.asarray(jax.nn.sigmoid(cl[0])[:, 2]).argmax())
    iou = float(iou_matrix(jnp.asarray([[8.0, 16, 40, 48]]),
                           boxes[best][None])[0, 0])
    assert iou > 0.5, iou


def test_loss_carries_ultralytics_batch_scale():
    """v8DetectionLoss semantics: ONE batch-wide target-score normalizer,
    then `* batch_size` — so duplicating an image K times multiplies the
    total by EXACTLY K (sums and the normalizer both scale by K) while
    the logged per-component parts (their loss_items) are invariant.
    A per-image mean (the pre-fix formulation) would keep the total flat,
    silently shrinking gradients ~batch-fold vs the pinned recipe."""
    hw = (32, 32)
    anchors, _ = make_anchors(hw)
    a = anchors.shape[0]
    # confident, roughly-right predictions so the batch normalizer is NOT
    # sitting on its max(sum, 1) clamp (in the clamped regime ultralytics
    # itself scales quadratically — the linear law below is the unclamped
    # contract): every anchor predicts a box of ltrb=2 feature units
    # (DFL logits peaked at bin 2) with class-2 score ~0.98
    dist = np.full((1, a, 4, 16), -8.0, np.float32)
    dist[..., 2] = 8.0
    bd1 = jnp.asarray(dist.reshape(1, a, 64))
    cl1 = jnp.asarray(np.where(np.arange(3) == 2, 4.0, -4.0)
                      * np.ones((1, a, 3), np.float32))
    gt1 = jnp.asarray([[[0.0, 0.0, 32.0, 32.0]]])
    lb1 = jnp.asarray([[2]])
    mk1 = jnp.asarray([[True]])
    total1, parts1 = yolo_detection_loss(bd1, cl1, gt1, lb1, mk1, hw)

    k = 4
    tile = lambda x: jnp.tile(x, (k,) + (1,) * (x.ndim - 1))
    totalk, partsk = yolo_detection_loss(tile(bd1), tile(cl1), tile(gt1),
                                         tile(lb1), tile(mk1), hw)
    assert float(totalk) == pytest.approx(k * float(total1), rel=1e-5)
    for key in ("box", "cls", "dfl"):
        assert float(partsk[key]) == pytest.approx(float(parts1[key]),
                                                   rel=1e-5), key
