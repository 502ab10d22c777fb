"""Fused two-stage pipeline: detect -> NMS -> inflate -> crop -> classify.

The reference runs this as a per-image Python loop with per-crop bs=1 ViT
forwards and multiple host<->device round-trips (`/root/reference/app.py:61`,
call stack in SURVEY.md §3.1).  Here it is ONE jitted XLA program over a
batch of images:

  images (B, H, W, 3) u8
    -> letterbox 640 (bilinear, cv2 semantics)          [ops.letterbox]
    -> YOLOv8 forward (NHWC, MXU)                       [models.yolov8]
    -> DFL decode + EfficientNMS-equiv (topk=100 pad)   [runtime.detector]
    -> un-letterbox to original pixel coords            [ops.boxes]
    -> conf>.35 filter + custom area-sorted NMS         [ops.nms]
    -> integer box round + (side//10)//2 inflation      [ops.boxes]
    -> batch-compacted crop gather -> 224 nearest       [ops.crop]
    -> [-1,1] normalize -> ViT classifier -> argmax     [models.vit]

Static-shape tricks:
  * detections padded to topk=100 with validity masks (the reference engine
    pads identically);
  * classification runs on a compact budget of `classify_budget` slots per
    image *averaged across the batch*: valid detections from the whole batch
    are compacted into (B*budget) crop slots by a top-k over validity, so a
    frame with 6 covers can borrow slots from an empty frame.  Class results
    scatter back to their (image, det) positions.  -1 where not classified.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec, VIT_B8_224
from yolov8_vit_tpu.models.yolov8 import YOLOv8, detect_spec
from yolov8_vit_tpu.ops import (
    unletterbox_boxes, area_sorted_nms, inflate_boxes, blob,
)
from yolov8_vit_tpu.ops.letterbox import letterbox_fast
from yolov8_vit_tpu.runtime.detector import decode_predictions


@dataclasses.dataclass(frozen=True)
class TwoStagePipeline:
    """Builds the fused forward function for given (static) shapes."""

    det_cfg: DetectConfig = DetectConfig()
    vit_spec: ViTSpec = VIT_B8_224
    num_classes: int = 5
    classify_budget: int = 4          # avg crops classified per image
    dtype: Any = jnp.float32          # activation dtype for both models
    # letterbox emits s2d cells (bit-exact, faster stem; ops/letterbox.py):
    # "cell" = s2d stem + b1/b2 in 2x2-cell layout (ops/cellconv.py, the
    # fast path), "s2d" = 2x2 cells feeding the matmul stem only, "flat" =
    # plain letterbox.  (A 4x4-cell variant chaining b0+b1 as
    # embedded-kernel matmuls measured WORSE end-to-end —
    # docs/performance.md round-2 notes; the "cell" mode instead keeps the
    # *activations* in cell layout across b1+b2, which measured faster.)
    stem_mode: str = "cell"
    # how deep the cell-layout region extends ("b2" | "b4",
    # models/yolov8.py cell_extent; only meaningful with stem_mode="cell")
    cell_extent: str = "b2"
    # explicit YOLOv8Spec field overrides as ((name, value), ...) — custom
    # depth/width scales beyond the named variants (engine meta "det_spec")
    det_overrides: tuple = ()

    @property
    def detector(self) -> YOLOv8:
        spec = detect_spec(self.det_cfg, self.det_overrides)
        return YOLOv8(spec, fused=True, stem_s2d=self.stem_mode != "flat",
                      cell_region=self.stem_mode == "cell",
                      cell_extent=self.cell_extent)

    @property
    def classifier(self) -> ViTClassifier:
        return ViTClassifier(self.vit_spec, self.num_classes, dtype=self.dtype)

    def init_params(self, rng, image_hw: tuple[int, int] = (640, 640)):
        """Random-init both param trees (for tests/benchmarks)."""
        r1, r2 = jax.random.split(rng)
        h, w = self.det_cfg.input_size
        if self.stem_mode != "flat":
            det_in = jnp.zeros((1, h // 2 + 1, w // 2 + 1, 12), self.dtype)
        else:
            det_in = jnp.zeros((1, h, w, 3), self.dtype)
        det = self.detector.init(r1, det_in)
        vs = self.vit_spec
        vit = self.classifier.init(
            r2, jnp.zeros((1, vs.img_size, vs.img_size, 3), self.dtype))
        return {"det": det, "vit": vit}

    def __call__(self, params, images: jnp.ndarray) -> dict:
        """images: (B, H, W, 3) uint8 RGB, any fixed size -> detection dict.

        Returns dict with static shapes (T = nms_topk):
          num_dets (B,) i32           stage-1 kept count
          boxes (B, T, 4) f32         xyxy in ORIGINAL image coords
          det_scores (B, T) f32
          det_labels (B, T) i32       stage-1 class, -1 padded
          final_valid (B, T) bool     survived conf>.35 + area-sorted NMS
          cls_labels (B, T) i32       stage-2 ViT class, -1 where invalid
          cls_scores (B, T) f32       stage-2 softmax prob of argmax
        """
        cfg = self.det_cfg
        b = images.shape[0]
        h, w = images.shape[1], images.shape[2]
        t = cfg.nms_topk

        # ---- stage 1: detect --------------------------------------------
        if self.stem_mode != "flat":
            from yolov8_vit_tpu.ops.letterbox import letterbox_s2d
            lb, ratio, dwdh = letterbox_s2d(images, cfg.input_size,
                                            pad_value=cfg.pad_value,
                                            dtype=self.dtype)
        else:
            lb, ratio, dwdh = letterbox_fast(images, cfg.input_size,
                                             pad_value=cfg.pad_value,
                                             dtype=self.dtype)
        det_in = blob(lb).astype(self.dtype)
        head = self.detector.apply(params["det"], det_in)
        num_dets, boxes_lb, det_scores, det_labels = \
            decode_predictions(head, cfg)

        boxes = unletterbox_boxes(boxes_lb, ratio, dwdh)
        img_wh = jnp.asarray([w, h, w, h], jnp.float32)
        boxes = jnp.clip(boxes, 0.0, img_wh)
        stage1_valid = det_labels >= 0

        # ---- second-stage filter + custom NMS ---------------------------
        final_valid = jax.vmap(
            lambda bx, sc, va: area_sorted_nms(
                bx, sc, va, iou_threshold=cfg.custom_nms_iou,
                score_threshold=cfg.conf_second)
        )(boxes, det_scores, stage1_valid)

        # ---- inflate + integer boxes ------------------------------------
        int_boxes = jnp.round(boxes).astype(jnp.int32).astype(jnp.float32)
        inflated = inflate_boxes(int_boxes, jnp.asarray([[w, h]], jnp.float32))
        inflated = jnp.round(inflated).astype(jnp.int32)      # (B, T, 4)

        # ---- batch compaction: pick K slots across the whole batch ------
        k = b * self.classify_budget
        flat_valid = final_valid.reshape(-1)                   # (B*T,)
        flat_scores = det_scores.reshape(-1)
        # priority: validity first, then score (so overflow drops lowest conf)
        priority = jnp.where(flat_valid, 1.0 + flat_scores, flat_scores)
        _, slot_idx = jax.lax.top_k(priority, k)               # (K,) into B*T
        slot_img = slot_idx // t
        slot_valid = flat_valid[slot_idx]

        slot_boxes = inflated.reshape(-1, 4)[slot_idx]         # (K, 4)

        # ---- gather crops directly in ViT patch layout, in int8 ---------
        # (K, n_patches, patch, patch*3) int8 of pixel-128: the one-hot
        # selection einsums run as int8 MXU dots, the source-frame gather
        # moves u8 bytes, and the [-1,1] normalization folds into the ViT
        # patch-embed weights (models/vit.py int8 branch) — patchify is a
        # matmul and no float pass over crop pixels exists anywhere
        vs = self.vit_spec
        from yolov8_vit_tpu.ops.crop import crop_to_patches_i8
        crops = crop_to_patches_i8(images, slot_img, slot_boxes,
                                   (vs.img_size, vs.img_size), vs.patch)

        # ---- stage 2: classify ------------------------------------------
        logits = self.classifier.apply(params["vit"], crops)   # (K, nc)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        k_labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        k_scores = jnp.max(probs, axis=-1)

        # ---- scatter class results back to (B, T) slots -----------------
        cls_labels = jnp.full((b * t,), -1, jnp.int32)
        cls_scores = jnp.zeros((b * t,), jnp.float32)
        k_labels = jnp.where(slot_valid, k_labels, -1)
        k_scores = jnp.where(slot_valid, k_scores, 0.0)
        cls_labels = cls_labels.at[slot_idx].set(k_labels).reshape(b, t)
        cls_scores = cls_scores.at[slot_idx].set(k_scores).reshape(b, t)

        return {
            "num_dets": num_dets,
            "boxes": boxes,
            "det_scores": det_scores,
            "det_labels": det_labels,
            "final_valid": final_valid,
            "cls_labels": cls_labels,
            "cls_scores": cls_scores,
        }

    def jit(self):
        """Return the jitted forward (params, images) -> dict."""
        from yolov8_vit_tpu.models.vit import vit_compiler_options
        return jax.jit(self.__call__,
                       compiler_options=vit_compiler_options(self.vit_spec))
