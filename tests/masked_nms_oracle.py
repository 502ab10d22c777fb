"""The legacy masked-matrix EfficientNMS formulation — cross-check oracle.

This is the original fori_loop-over-a-boolean-mask NMS that shipped before
the full-candidate Pallas scan kernel (`ops/nms.py::efficient_nms_scan`)
became the production path.  It was retired from the package (round-4
VERDICT item 7) because an explicit small `pre_topk` truncates the
multi-label candidate pool and can diverge from the plugin-exact scan
kernel on dense scenes; tests keep it as an independently-derived oracle —
same contract, different algorithm — to cross-check the kernel.

Semantics target: EfficientNMS_TRT (IoU .65, conf .25, topk 100,
class-aware, background -1, box_coding xyxy), fixed-size outputs
(`/root/reference/docs/YOLO_TensorRT_Technical.md:106-151`,
`/root/reference/tech.md:41-47`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.ops.boxes import box_iou
from yolov8_vit_tpu.ops.nms import _greedy_suppress


def _multilabel_candidates(boxes: jnp.ndarray, scores: jnp.ndarray):
    """(N, 4) boxes + (N, C) scores -> per-(anchor, class) candidate pool
    (N*C boxes/scores/labels), CLASS-major (anchor varies fastest).

    EfficientNMS_TRT in its default (non-class-agnostic) mode treats every
    (box, class) pair above the score threshold as a separate candidate
    (`/root/reference/docs/YOLO_TensorRT_Technical.md:106-135`) — an anchor
    with two classes above threshold yields two detections.  Class-major
    ordering pins the score-tie order (lowest pool index first = lowest
    class, then lowest anchor) consistently with the Pallas kernel's
    (class, anchor-row, lane) layout."""
    n, c = scores.shape
    flat_scores = scores.T.reshape(-1)
    flat_labels = jnp.repeat(jnp.arange(c, dtype=jnp.int32), n)
    flat_boxes = jnp.tile(boxes, (c, 1))
    return flat_boxes, flat_scores, flat_labels


def efficient_nms(boxes: jnp.ndarray, scores: jnp.ndarray, *,
                  iou_threshold: float = 0.65,
                  score_threshold: float = 0.25,
                  max_output: int = 100,
                  pre_topk: int | None = None,
                  class_aware: bool = True,
                  multi_label: bool = True):
    """EfficientNMS_TRT-equivalent with static output shapes (oracle).

    Args:
      boxes:  (N, 4) xyxy in letterboxed coords.
      scores: (N, C) per-class scores (already sigmoided).
      pre_topk: candidate-pool truncation (static shape for the fori_loop
        pass).  Default None = the FULL pool (no truncation — exact).  An
        explicit value below the pool size truncates candidates the scan
        kernel keeps and can diverge on dense scenes; only pass one in
        constructions where truncation is provably lossless (e.g. one
        nonzero class per anchor with pre_topk >= N).
      multi_label: plugin parity — every (anchor, class) pair above the
        threshold is its own candidate; False reduces each anchor to its
        argmax class first (cheaper, diverges when an anchor has two
        classes above threshold).
    Returns:
      num_dets: () int32
      out_boxes: (max_output, 4), zero-padded
      out_scores: (max_output,), zero-padded
      out_labels: (max_output,) int32, -1-padded
    Output order is score-descending, matching the plugin.
    """
    n, _ = scores.shape
    if multi_label and class_aware:
        pool_boxes, pool_scores, pool_labels = \
            _multilabel_candidates(boxes, scores)
    else:
        pool_boxes = boxes
        pool_scores = jnp.max(scores, axis=-1)
        pool_labels = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    if pre_topk is None:
        pre_topk = pool_scores.shape[0]
    valid = pool_scores > score_threshold

    k = min(pre_topk, pool_scores.shape[0])
    cand_scores, cand_idx = jax.lax.top_k(
        jnp.where(valid, pool_scores, -1.0), k)
    cand_boxes = pool_boxes[cand_idx]
    cand_labels = pool_labels[cand_idx]
    cand_valid = cand_scores > score_threshold

    if class_aware:
        # per-class offset trick: separate class bands so one agnostic pass
        # == per-class NMS.  Stride 2*side (not side): boxes may have
        # NEGATIVE coords (unclamped DFL decode), so a band must cover
        # [-side+1, side-1] on each side of its center
        side = jnp.max(jnp.abs(cand_boxes)) + 1.0
        offset = cand_labels.astype(cand_boxes.dtype)[:, None] * (2.0 * side)
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
