"""Box geometry ops (xyxy convention throughout)."""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes -> (N, M).

    Same formulation as torchvision `box_iou` used by the reference's custom
    NMS (`/root/reference/README.md:62-84`).
    """
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def unletterbox_boxes(boxes: jnp.ndarray, ratio: float,
                      dwdh: tuple[float, float]) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to the original image.

    Reference: `bboxes -= dwdh; bboxes /= ratio`
    (`/root/reference/YOLOTensorRT_yolodet_py_解读.md:89-92`).
    """
    dw, dh = dwdh
    shift = jnp.asarray([dw, dh, dw, dh], dtype=boxes.dtype)
    return (boxes - shift) / ratio


def inflate_boxes(boxes: jnp.ndarray, img_wh: jnp.ndarray,
                  training: bool = False) -> jnp.ndarray:
    """Inflate xyxy boxes before cropping, clamped to the image.

    Implements the *code* behavior of the reference (not the alpha=0.1 the
    docs claim — SURVEY.md §7 "crop_image discrepancy"): at eval each side
    moves out by `((side_len // 10) // 2)` pixels, integer arithmetic
    (`/root/reference/utils/trainClass.py:76-91`).  `img_wh` is (..., 2)
    (width, height) per box or broadcastable.

    The random train-time inflation (randint(0, side//10)) lives in the data
    pipeline, not here — this op is the deterministic inference path.
    """
    del training
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    dis_x = jnp.floor_divide(jnp.floor(x2 - x1).astype(jnp.int32), 10)
    dis_y = jnp.floor_divide(jnp.floor(y2 - y1).astype(jnp.int32), 10)
    ex = (dis_x // 2).astype(boxes.dtype)
    ey = (dis_y // 2).astype(boxes.dtype)
    w = img_wh[..., 0]
    h = img_wh[..., 1]
    out = jnp.stack([
        jnp.maximum(0.0, x1 - ex),
        jnp.maximum(0.0, y1 - ey),
        jnp.minimum(w, x2 + ex),
        jnp.minimum(h, y2 + ey),
    ], axis=-1)
    return out
