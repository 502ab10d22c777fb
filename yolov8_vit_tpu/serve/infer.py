"""Two-stage inference orchestrator — `inferdet.main` / `yolodet.main` parity.

The reference's per-image flow (documented at
`/root/reference/YOLOTensorRT_yolodet_py_解读.md:57-117`, call signature from
`/root/reference/app.py:61` and `/root/reference/test.py:28`):

  imread -> letterbox -> RGB -> blob -> Engine -> postprocess ->
  un-letterbox -> conf>=.35 filter -> per-box inflate+crop -> 224 transform
  -> ViT -> draw -> optional OSS upload -> optional func callback ->
  flatten to sorted (img, cls_id, conf, x1, y1, x2, y2) tuples.

Here the detector runs once per image through the jitted detect Engine and
ALL crops of an image classify as one batch (the reference runs bs=1 ViT
per crop).  For homogeneous-size streams use models.TwoStagePipeline, which
fuses everything into a single device program; this host path exists for
arbitrary mixed-size directory input and full API parity.
"""
from __future__ import annotations

import os
from typing import Callable, Sequence

import cv2
import numpy as np

from yolov8_vit_tpu.config import CLASS_NAMES

_COLORS = [(0, 200, 0), (0, 0, 220), (160, 160, 160), (0, 140, 255),
           (255, 160, 0)]


def path_to_list(imgs) -> list[str]:
    """Single path / list / directory -> sorted list of image paths."""
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    if isinstance(imgs, (list, tuple)):
        return [str(p) for p in imgs]
    if os.path.isdir(imgs):
        return sorted(os.path.join(imgs, f) for f in os.listdir(imgs)
                      if f.lower().endswith(exts))
    return [str(imgs)]


def draw_image(image: np.ndarray, box: Sequence[float], cls) -> np.ndarray:
    """Draw one box + label on a BGR image (reference draw_image parity)."""
    idx = cls if isinstance(cls, int) else (
        CLASS_NAMES.index(cls) if cls in CLASS_NAMES else 0)
    color = _COLORS[idx % len(_COLORS)]
    x1, y1, x2, y2 = (int(round(v)) for v in box)
    cv2.rectangle(image, (x1, y1), (x2, y2), color, 2)
    name = CLASS_NAMES[idx] if isinstance(cls, int) else str(cls)
    cv2.putText(image, f"{name}:1", (x1, max(y1 - 5, 12)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
    return image


def _letterbox_host(im: np.ndarray, new_wh: tuple[int, int],
                    color=(114, 114, 114)):
    """Host-side cv2 letterbox, bit-identical to the reference preprocessing."""
    shape = im.shape[:2]
    r = min(new_wh[0] / shape[1], new_wh[1] / shape[0])
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw = (new_wh[0] - new_unpad[0]) / 2
    dh = (new_wh[1] - new_unpad[1]) / 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right,
                            cv2.BORDER_CONSTANT, value=color)
    return im, r, (dw, dh)


def _crop_nearest_224(rgb: np.ndarray, box: Sequence[int],
                      size: int = 224) -> np.ndarray:
    """Integer crop + nearest resize (the ops/crop.py contract, host mirror)."""
    x1, y1, x2, y2 = (int(v) for v in box)
    x1 = min(max(x1, 0), rgb.shape[1] - 1)
    y1 = min(max(y1, 0), rgb.shape[0] - 1)
    x2 = min(max(x2, x1 + 1), rgb.shape[1])
    y2 = min(max(y2, y1 + 1), rgb.shape[0])
    crop = rgb[y1:y2, x1:x2]
    bh, bw = crop.shape[:2]
    sx = np.minimum(np.arange(size) * bw // size, bw - 1)
    sy = np.minimum(np.arange(size) * bh // size, bh - 1)
    return crop[sy[:, None], sx[None, :]]


def _area_nms_host(boxes: np.ndarray, scores: np.ndarray,
                   iou_threshold: float = 0.45) -> np.ndarray:
    """Custom area-sorted NMS, host mirror of ops.nms.area_sorted_nms
    (`/root/reference/README.md:41-84`).  Returns kept indices (input order
    preserved)."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    order = np.argsort(-areas, kind="stable")
    kept = []
    for i in order:
        ok = True
        for j in kept:
            bi, bj = boxes[i], boxes[j]
            ix = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            iy = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = ix * iy
            union = areas[i] + areas[j] - inter
            if inter / max(union, 1e-9) > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
    return np.sort(np.asarray(kept, np.int64))


def _inflate(box, img_w, img_h):
    """Eval-time inflation (`/root/reference/utils/trainClass.py:85-91`)."""
    x1, y1, x2, y2 = (int(v) for v in box)
    dis_x = (x2 - x1) // 10
    dis_y = (y2 - y1) // 10
    return (max(0, x1 - dis_x // 2), max(0, y1 - dis_y // 2),
            min(img_w, x2 + dis_x // 2), min(img_h, y2 + dis_y // 2))


def main(Engine, imgs, device=None, model_list: Sequence = (),
         transform=None, aliyunoss=None, func: Callable | None = None,
         conf_threshold: float | None = None, save_draw_dir: str | None = None,
         upload_prefix: str = "FuChuang/", crop_size: int = 224):
    """Run two-stage inference over images; return flattened sorted tuples.

    Engine: detect Engine (runtime.Engine, kind="detect").
    model_list: classifier callables/Engines taking NCHW [-1,1] float crops
      and returning logits — the first one is used (reference behavior with
      a one-element model list, `/root/reference/app.py:30-37`).
    transform: accepted for API parity; the pipeline always applies the
      nearest-resize + mean/std .5 normalization the reference configures.
    func: optional callback func(folder, filename, path, objects) — e.g.
      data.generate_annotation for model-assisted labeling
      (`/root/reference/test.py:28`).
    crop_size: classifier input side (224 for the deployed ViTs; tests use
      tiny classifiers).
    """
    import jax.numpy as jnp  # deferred: keep module import light

    del device, transform
    det_cfg = getattr(Engine, "det_cfg")
    h_in, w_in = det_cfg.input_size
    # the second-stage thresholds come from the engine's config (the
    # reference hardcodes 0.45/0.35, which are DetectConfig's defaults too;
    # the fused pipeline reads the same fields, so host and fused paths
    # agree at any configuration — an explicit conf_threshold argument
    # still overrides)
    area_iou = getattr(det_cfg, "custom_nms_iou", 0.45)
    if conf_threshold is None:
        conf_threshold = getattr(det_cfg, "conf_second", 0.35)
    results = []
    for path in path_to_list(imgs):
        bgr = cv2.imread(path)
        if bgr is None:
            continue
        draw = bgr.copy()
        basename = os.path.basename(path)
        lb, ratio, (dw, dh) = _letterbox_host(bgr, (w_in, h_in))
        rgb = cv2.cvtColor(lb, cv2.COLOR_BGR2RGB)
        tensor = rgb.transpose(2, 0, 1)[None].astype(np.float32) / 255.0

        num, bboxes, scores, labels = Engine(tensor)
        n = int(np.asarray(num).reshape(-1)[0])
        bboxes = np.asarray(bboxes).reshape(-1, 4)[:n]
        scores = np.asarray(scores).reshape(-1)[:n]
        labels = np.asarray(labels).reshape(-1)[:n]

        # un-letterbox to original coords
        bboxes = (bboxes - np.array([dw, dh, dw, dh])) / ratio
        ih, iw = bgr.shape[:2]
        bboxes = bboxes.clip([0, 0, 0, 0], [iw, ih, iw, ih])

        # strictly > like the device kernel (ops/nms.py area_sorted_nms) —
        # a >= here diverged from the fused path on exact-boundary scores
        keep = scores > conf_threshold
        bboxes, scores, labels = bboxes[keep], scores[keep], labels[keep]

        # custom area-sorted second NMS (reference README.md:41-84)
        kept = _area_nms_host(bboxes, scores, area_iou)
        bboxes, scores, labels = bboxes[kept], scores[kept], labels[kept]

        objects = []
        cls_ids = labels.astype(int).tolist()
        # crops exist only to feed the classifier — detect-only serving
        # (empty model_list) must not pay a 224x224 gather per box
        if len(bboxes) and model_list:
            rgb_full = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            crops = [_crop_nearest_224(rgb_full, _inflate(np.round(b),
                                                          iw, ih), crop_size)
                     for b in bboxes]
            batch = np.stack(crops).astype(np.float32) / 255.0 * 2.0 - 1.0
            logits = np.asarray(model_list[0](
                jnp.asarray(batch.transpose(0, 3, 1, 2))))
            cls_ids = logits.argmax(-1).astype(int).tolist()

        for i, (box, score) in enumerate(zip(bboxes, scores)):
            cls_id = int(cls_ids[i])
            x1, y1, x2, y2 = (float(v) for v in box)
            draw_image(draw, (x1, y1, x2, y2), cls_id)
            objects.append({"sort": CLASS_NAMES[cls_id],
                            "xmin": int(x1), "ymin": int(y1),
                            "xmax": int(x2), "ymax": int(y2)})
            results.append((basename, cls_id, float(score),
                            int(x1), int(y1), int(x2), int(y2)))

        if save_draw_dir:
            os.makedirs(save_draw_dir, exist_ok=True)
            out_path = os.path.join(save_draw_dir, basename)
            cv2.imwrite(out_path, draw)
            if aliyunoss is not None:
                aliyunoss.put_object_from_file(upload_prefix + basename,
                                               out_path)
        if func is not None:
            func("", basename, path, objects)

    results.sort(key=lambda x: x[0])
    return results
