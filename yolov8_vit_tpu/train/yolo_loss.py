"""YOLOv8 detection loss: task-aligned assigner + CIoU + DFL + BCE.

The reference delegates YOLO fine-tuning to `ultralytics model.train()`
(`/root/reference/utils/trainYolo.py:33`) — a black box this framework
re-implements natively (SURVEY.md §7 "Ultralytics-free YOLO training").
Semantics follow the YOLOv8 training recipe:

  * TaskAlignedAssigner(topk=10, alpha=0.5, beta=6.0): candidate anchors are
    those whose center lies inside a gt box; alignment metric
    score^alpha * IoU^beta; top-10 anchors per gt; conflicts resolve to the
    gt with the highest IoU; target scores are metric-normalized.
  * box loss: (1 - CIoU) weighted by assigned target score, mean over fg.
  * DFL loss: cross-entropy of the reg_max distribution against the two
    integer bins bracketing the fractional ltrb target, same weighting.
  * cls loss: BCE(pred, aligned target scores) summed / fg score sum.
  * total = 7.5*box + 0.5*cls + 1.5*dfl (ultralytics default gains).

Everything is static-shape: gt boxes pad to `max_gt` with a validity mask,
so the whole loss jits and shards over the data axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.ops.dfl import make_anchors


def pairwise_ciou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """CIoU between (..., 4) xyxy boxes (elementwise over leading dims)."""
    eps = 1e-7
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1

    inter = (jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1)).clip(0) * \
            (jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1)).clip(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 +
            (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / jnp.pi ** 2) * \
        (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return (iou - (rho2 / c2 + v * alpha))[..., 0]


def iou_matrix(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Plain IoU between (G, 4) gt and (A, 4) pred -> (G, A)."""
    eps = 1e-7
    lt = jnp.maximum(gt[:, None, :2], pred[None, :, :2])
    rb = jnp.minimum(gt[:, None, 2:], pred[None, :, 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]))[:, None]
    a2 = ((pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1]))[None, :]
    return inter / (a1 + a2 - inter + eps)


def task_aligned_assign(pred_scores: jnp.ndarray, pred_boxes: jnp.ndarray,
                        anchors_xy: jnp.ndarray, gt_boxes: jnp.ndarray,
                        gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
                        topk: int = 10, alpha: float = 0.5,
                        beta: float = 6.0):
    """Single-image task-aligned assignment.

    Args:
      pred_scores: (A, C) sigmoid class scores.
      pred_boxes: (A, 4) decoded xyxy (input pixels).
      anchors_xy: (A, 2) anchor centers (input pixels).
      gt_boxes: (G, 4) xyxy padded.
      gt_labels: (G,) int, padded.
      gt_mask: (G,) bool validity.
    Returns:
      fg_mask (A,), assigned_gt (A,) index, target_scores (A, C).
    """
    num_gt, num_anchors = gt_boxes.shape[0], pred_boxes.shape[0]

    # candidates: anchor center strictly inside gt box
    lt = anchors_xy[None, :, :] - gt_boxes[:, None, :2]
    rb = gt_boxes[:, None, 2:] - anchors_xy[None, :, :]
    in_gt = jnp.minimum(lt.min(-1), rb.min(-1)) > 1e-9        # (G, A)

    ious = iou_matrix(gt_boxes, pred_boxes).clip(0)            # (G, A)
    # floor the class score: sigmoid underflows to exact 0 in f32 for very
    # negative logits, which would zero the metric for every anchor and
    # permanently empty the foreground set (training collapse)
    cls_score = pred_scores[:, gt_labels.clip(0)].T.clip(1e-9)  # (G, A)
    metric = (cls_score ** alpha) * (ious ** beta)
    metric = jnp.where(in_gt & gt_mask[:, None], metric, 0.0)

    # top-k per gt by metric
    k = min(topk, num_anchors)
    topk_vals, topk_idx = jax.lax.top_k(metric, k)             # (G, k)
    topk_ok = topk_vals > 0
    sel = jnp.zeros((num_gt, num_anchors), bool)
    sel = sel.at[jnp.arange(num_gt)[:, None], topk_idx].max(topk_ok)
    sel = sel & in_gt & gt_mask[:, None]

    # conflicts: anchor claimed by >1 gt -> keep the gt with max IoU
    claimed = sel.sum(0)                                       # (A,)
    iou_sel = jnp.where(sel, ious, -1.0)
    best_gt = jnp.argmax(iou_sel, axis=0)                      # (A,)
    keep = jnp.zeros_like(sel).at[best_gt, jnp.arange(num_anchors)].set(True)
    sel = jnp.where(claimed[None, :] > 1, sel & keep, sel)

    fg_mask = sel.any(0)
    assigned_gt = jnp.argmax(sel, axis=0)                      # (A,)

    # normalized target scores (ultralytics norm_align_metric)
    pos_metric = jnp.where(sel, metric, 0.0)
    pos_iou = jnp.where(sel, ious, 0.0)
    amax = pos_metric.max(-1, keepdims=True)                   # (G, 1)
    imax = pos_iou.max(-1, keepdims=True)
    norm = pos_metric * imax / (amax + 1e-9)                   # (G, A)
    score_a = jnp.where(sel, norm, 0.0).max(0)                 # (A,)
    onehot = jax.nn.one_hot(gt_labels[assigned_gt],
                            pred_scores.shape[-1])
    target_scores = onehot * score_a[:, None] * fg_mask[:, None]
    return fg_mask, assigned_gt, target_scores


def _dfl_loss(dist_logits: jnp.ndarray, target: jnp.ndarray,
              reg_max: int) -> jnp.ndarray:
    """Distribution focal loss per element: CE against bracketing bins.

    dist_logits: (..., 4, reg_max); target: (..., 4) in [0, reg_max-1].
    Returns (..., ) mean over the 4 sides.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(dist_logits, axis=-1)
    ll = jnp.take_along_axis(logp, tl.clip(0, reg_max - 1)[..., None],
                             axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, tr.clip(0, reg_max - 1)[..., None],
                             axis=-1)[..., 0]
    return -(ll * wl + lr * wr).mean(-1)


def yolo_detection_loss(box_dist: jnp.ndarray, cls_logits: jnp.ndarray,
                        gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                        gt_mask: jnp.ndarray, input_hw: tuple[int, int],
                        strides: tuple[int, ...] = (8, 16, 32),
                        reg_max: int = 16,
                        gains: tuple[float, float, float] = (7.5, 0.5, 1.5)):
    """Batched YOLOv8 loss.

    Args:
      box_dist: (B, A, 4*reg_max) raw DFL logits (flatten_head_outputs).
      cls_logits: (B, A, C).
      gt_boxes: (B, G, 4) xyxy input pixels (padded).
      gt_labels: (B, G) int.
      gt_mask: (B, G) bool.
    Returns (total, {box, cls, dfl}).  Normalization matches ultralytics'
    v8DetectionLoss exactly: one BATCH-wide target-score sum, gains, then
    `* batch_size` (their gradient-accumulation convention — the pinned
    lr0/momentum recipe assumes this scale; a per-image mean would make
    gradients ~batch-times smaller than the recipe expects).  The logged
    parts are the unscaled per-component terms (their loss_items).
    """
    b, a, _ = cls_logits.shape
    anchors, stride = make_anchors(input_hw, strides)
    anchors_px = anchors * stride                              # (A, 2)
    pred_scores = jax.nn.sigmoid(cls_logits)

    dist = box_dist.reshape(b, a, 4, reg_max)
    probs = jax.nn.softmax(dist, axis=-1)
    ltrb = probs @ jnp.arange(reg_max, dtype=probs.dtype)      # (B, A, 4)
    pred_boxes = jnp.concatenate(
        [anchors[None] - ltrb[..., :2], anchors[None] + ltrb[..., 2:]],
        axis=-1) * stride[None, :, :]                          # xyxy px

    def per_image(ps, pb, gb, gl, gm):
        return task_aligned_assign(ps, pb, anchors_px, gb, gl, gm)

    # assignment is a (non-differentiable) target-construction step — run it
    # gradient-stopped like ultralytics' no_grad assigner; x**0.5 in the
    # alignment metric otherwise injects inf grads at score->0
    fg, agt, tscore = jax.lax.stop_gradient(jax.vmap(per_image)(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes), gt_boxes, gt_labels, gt_mask))
    # ONE batch-wide normalizer (ultralytics target_scores_sum)
    tsum = jnp.maximum(tscore.sum(), 1.0)

    # cls: BCE with aligned scores
    xl = cls_logits
    bce = jnp.maximum(xl, 0) - xl * tscore + jnp.log1p(jnp.exp(-jnp.abs(xl)))
    cls_loss = bce.sum() / tsum

    # box + dfl on fg anchors
    tgt_boxes = jnp.take_along_axis(gt_boxes, agt[..., None], axis=1)  # (B,A,4)
    weight = jnp.where(fg, tscore.sum(-1), 0.0)                 # (B, A)

    ciou = pairwise_ciou(pred_boxes, tgt_boxes)                 # (B, A)
    box_loss = ((1.0 - ciou) * weight).sum() / tsum

    # dfl target: gt ltrb distances in feature units, clamped
    tb = tgt_boxes / stride[None, :, :]                         # (B, A, 4)
    tgt_ltrb = jnp.concatenate(
        [anchors[None] - tb[..., :2], tb[..., 2:] - anchors[None]], -1)
    tgt_ltrb = tgt_ltrb.clip(0, reg_max - 1 - 0.01)
    dfl = _dfl_loss(box_dist.reshape(b, a, 4, reg_max), tgt_ltrb, reg_max)
    dfl_loss_v = (dfl * weight).sum() / tsum

    g_box, g_cls, g_dfl = gains
    total = (g_box * box_loss + g_cls * cls_loss + g_dfl * dfl_loss_v) * b
    parts = {"box": g_box * box_loss, "cls": g_cls * cls_loss,
             "dfl": g_dfl * dfl_loss_v}
    return total, parts
