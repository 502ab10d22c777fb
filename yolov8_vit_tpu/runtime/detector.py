"""Detection decode: raw YOLOv8 head outputs -> NMS'd detections.

Equivalent of what the reference bakes into the TensorRT engine after the
backbone (DFL decode + EfficientNMS plugin,
`/root/reference/docs/YOLO_TensorRT_Technical.md:53-151`) — here it is just
more XLA ops in the same jitted graph.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.yolov8 import flatten_head_outputs
from yolov8_vit_tpu.ops import dfl_decode, make_anchors
from yolov8_vit_tpu.ops.nms import efficient_nms_scan


def decode_predictions(head_outputs, cfg: DetectConfig):
    """Per-level head maps -> (num_dets, boxes, scores, labels), batched.

    Boxes are xyxy in letterboxed-input pixels, padded to cfg.nms_topk rows
    (the engine's fixed 'num_dets/bboxes/scores/labels' output contract,
    `/root/reference/app.py:29`).
    """
    box_dist, cls_logits = flatten_head_outputs(head_outputs)
    # decode in f32 regardless of the backbone's activation dtype: the DFL
    # softmax-expectation and score sigmoid are tiny (A x 64) and the NMS
    # kept-set is sensitive to box/score precision
    box_dist = box_dist.astype(jnp.float32)
    anchors, stride = make_anchors(cfg.input_size, cfg.strides)
    boxes = dfl_decode(box_dist, anchors, stride, cfg.reg_max)
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

    if cfg.nms_impl != "scan":
        # the masked fori_loop formulation was retired (round-4): with a
        # small nms_pre_topk it truncated the multi-label candidate pool
        # and could diverge from the plugin-exact scan kernel on dense
        # scenes.  It lives on as the tests' oracle
        # (tests/masked_nms_oracle.py); production decode is scan-only.
        raise ValueError(
            f"nms_impl={cfg.nms_impl!r} is not supported: the 'masked' "
            f"implementation was retired; use nms_impl='scan'")

    def one(b, s):
        return efficient_nms_scan(
            b, s, iou_threshold=cfg.nms_iou,
            score_threshold=cfg.nms_conf, max_output=cfg.nms_topk)

    return jax.vmap(one)(boxes, scores)
