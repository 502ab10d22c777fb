"""On-device NMS as masked matrix ops with static shapes.

The reference runs NMS twice:

 1. In-engine `EfficientNMS_TRT` (IoU .65, conf .25, topk 100, class-aware,
    background -1, box_coding xyxy) emitting fixed-size
    (num_dets, bboxes[topk], scores[topk], labels[topk])
    (`/root/reference/docs/YOLO_TensorRT_Technical.md:106-151`,
    `/root/reference/tech.md:41-47`).  -> `efficient_nms`.
 2. A custom second pass that filters conf > .35, orders boxes by *area*
    descending, and suppresses at IoU .45 to merge duplicate covers
    (`/root/reference/README.md:41-84`).  -> `area_sorted_nms`.

Both are greedy sequential algorithms; on TPU we precompute the full O(K^2)
IoU matrix once (MXU/VPU friendly) and run the ordering-dependent suppression
scan as a `lax.fori_loop` over a boolean mask — K is a static candidate count
(default 512), so the whole thing jits with fixed shapes and the topk=100
padded outputs keep every downstream shape static (the reference engine pads
to topk=100 the same way).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.ops.boxes import box_iou, box_area


def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Sequential greedy NMS over pre-ordered candidates.

    `iou` is (K, K) for candidates already sorted by priority (desc).
    Returns keep mask (K,).  Row i suppresses later rows j>i with
    IoU > threshold, exactly matching the reference's loop semantics
    (`/root/reference/README.md:62-84`): a suppressed box never suppresses
    others.
    """
    k = iou.shape[0]
    over = iou > iou_threshold

    def body(i, state):
        keep, suppressed = state
        keep_i = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        # suppress strictly-later candidates overlapping i
        later = jnp.arange(k) > i
        suppressed = suppressed | (keep_i & later & over[i])
        return keep, suppressed

    keep0 = jnp.zeros((k,), dtype=bool)
    sup0 = jnp.zeros((k,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, k, body, (keep0, sup0))
    return keep


def efficient_nms(boxes: jnp.ndarray, scores: jnp.ndarray, *,
                  iou_threshold: float = 0.65,
                  score_threshold: float = 0.25,
                  max_output: int = 100,
                  pre_topk: int = 512,
                  class_aware: bool = True):
    """EfficientNMS_TRT-equivalent with static output shapes.

    Args:
      boxes:  (N, 4) xyxy in letterboxed coords.
      scores: (N, C) per-class scores (already sigmoided).
    Returns:
      num_dets: () int32
      out_boxes: (max_output, 4), zero-padded
      out_scores: (max_output,), zero-padded
      out_labels: (max_output,) int32, -1-padded
    Output order is score-descending, matching the plugin.
    """
    n, _ = scores.shape
    per_anchor_score = jnp.max(scores, axis=-1)
    per_anchor_label = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    valid = per_anchor_score > score_threshold

    k = min(pre_topk, n)
    cand_scores, cand_idx = jax.lax.top_k(
        jnp.where(valid, per_anchor_score, -1.0), k)
    cand_boxes = boxes[cand_idx]
    cand_labels = per_anchor_label[cand_idx]
    cand_valid = cand_scores > score_threshold

    if class_aware:
        # standard per-class offset trick: boxes of different classes never
        # overlap, so one agnostic pass == per-class NMS
        side = jnp.max(jnp.abs(cand_boxes)) + 1.0
        offset = cand_labels.astype(cand_boxes.dtype)[:, None] * side
        iou = box_iou(cand_boxes + offset, cand_boxes + offset)
    else:
        iou = box_iou(cand_boxes, cand_boxes)

    keep = _greedy_suppress(iou, cand_valid, iou_threshold)

    if k < max_output:  # fewer candidates than output slots: pad
        pad = max_output - k
        keep = jnp.pad(keep, (0, pad))
        cand_scores = jnp.pad(cand_scores, (0, pad), constant_values=-1.0)
        cand_boxes = jnp.pad(cand_boxes, ((0, pad), (0, 0)))
        cand_labels = jnp.pad(cand_labels, (0, pad))

    kept_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, sel = jax.lax.top_k(kept_scores, max_output)
    picked = out_scores > score_threshold
    out_boxes = jnp.where(picked[:, None], cand_boxes[sel], 0.0)
    out_labels = jnp.where(picked, cand_labels[sel], -1)
    out_scores = jnp.where(picked, out_scores, 0.0)
    num_dets = jnp.sum(picked).astype(jnp.int32)
    return num_dets, out_boxes, out_scores, out_labels


def area_sorted_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, *,
                    iou_threshold: float = 0.45,
                    score_threshold: float = 0.35,
                    sort_by: str = "area"):
    """The reference's custom second-stage NMS, fully on device.

    Filters conf > theta_c (default .35), orders remaining boxes by area
    descending (doc behavior, `/root/reference/README.md:44-57`; pass
    sort_by="score" for the README code-snippet variant), suppresses at
    IoU .45, class-agnostic.  Operates in-place on the padded topk slots:
    returns a keep mask aligned with the input rows (original row order is
    preserved for downstream crop indexing).
    """
    valid = valid & (scores > score_threshold)
    key = box_area(boxes) if sort_by == "area" else scores
    order = jnp.argsort(jnp.where(valid, key, -jnp.inf), descending=True)
    iou = box_iou(boxes[order], boxes[order])
    keep_sorted = _greedy_suppress(iou, valid[order], iou_threshold)
    # scatter back to original row positions
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep
