"""Aspect-preserving resize + pad ("letterbox") as a jitted XLA op.

Behavioral parity with the reference host-side letterbox (triple-Mu
`models/utils.py`, pinned by `/root/reference/YOLOTensorRT_yolodet_py_解读.md:67-78`):

    r        = min(W_out/w, H_out/h)
    new_wh   = (round(w*r), round(h*r))
    dw, dh   = (W_out-new_w)/2, (H_out-new_h)/2
    top,bot  = round(dh-0.1), round(dh+0.1)
    left,rt  = round(dw-0.1), round(dw+0.1)
    pad value 114, bilinear resize

Returns (image, ratio, (dw, dh)); detections are later un-letterboxed with
`bboxes -= dwdh; bboxes /= ratio` (same doc, :89-92).

Shapes are static per input size: XLA compiles one program per unique input
resolution (cached), which is the TPU-idiomatic replacement for the
per-image cv2 calls of the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from yolov8_vit_tpu.ops.resize import resize_bilinear, resize_bilinear_mm


def letterbox_params(in_hw: tuple[int, int], out_hw: tuple[int, int]):
    """Static letterbox geometry: (new_h, new_w, ratio, dw, dh, top, left)."""
    h, w = in_hw
    out_h, out_w = out_hw
    r = min(out_w / w, out_h / h)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw, dh = (out_w - new_w) / 2.0, (out_h - new_h) / 2.0
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    return new_h, new_w, r, dw, dh, top, left


def letterbox(img: jnp.ndarray, out_hw: tuple[int, int],
              pad_value: int = 114):
    """Letterbox (H, W, C) [or batched (..., H, W, C)] to out_hw.

    Returns (padded image, ratio: float, dwdh: (dw, dh) floats).  Ratio/dwdh
    are Python floats (static — they depend only on shapes), so downstream
    un-letterboxing folds into the jitted graph as constants.
    """
    out_h, out_w = out_hw
    h, w = img.shape[-3], img.shape[-2]
    new_h, new_w, r, dw, dh, top, left = letterbox_params((h, w), out_hw)

    resized = img if (new_h, new_w) == (h, w) else resize_bilinear(img, (new_h, new_w))
    pad_cfg = [(0, 0)] * (img.ndim - 3) + [
        (top, out_h - new_h - top),
        (left, out_w - new_w - left),
        (0, 0),
    ]
    padded = jnp.pad(resized, pad_cfg, constant_values=pad_value)
    return padded, r, (dw, dh)


def letterbox_s2d(img: jnp.ndarray, out_hw: tuple[int, int],
                  pad_value: int = 114, dtype=jnp.bfloat16):
    """Letterbox emitting space-to-depth 2x2 cells over the pad-1 canvas.

    Returns (cells (B, out/2+1, out/2+1, 4*C), ratio, dwdh) where
    cells[b, i, j, (p, q, c)] == padded-canvas[b, 2i+p, 2j+q, c] and the
    canvas is the `letterbox` output with an extra 1-pixel ZERO border —
    the stem conv's own zero padding, pre-applied.  (The `pad_value` 114
    fill applies only to the letterbox bands INSIDE the canvas; conflating
    the two shifts first-layer border activations, which random-init tests
    barely notice but trained weights would.)

    The s2d layout costs NOTHING here: the interpolation einsum simply
    emits its output with the (row-phase, col-phase) indices placed last —
    a standalone relayout of the same tensor measured 7x slower.  Feeding
    models.yolov8.S2DStem, this makes the stem's stride-2 convs stride-1
    in cell space (bit-identical; ~1 ms faster at 640² batch 8).
    """
    import numpy as np
    out_h, out_w = out_hw
    assert out_h % 2 == 0 and out_w % 2 == 0
    h, w = img.shape[-3], img.shape[-2]
    new_h, new_w, r, dw, dh, top, left = letterbox_params((h, w), out_hw)

    from yolov8_vit_tpu.ops.resize import interp_matrix

    def canvas_matrix(out, new, src, off):
        m = np.zeros((out + 2, src), np.float32)
        rw = interp_matrix(new, src) if new != src else np.eye(src,
                                                               dtype=np.float32)
        m[1 + off:1 + off + new] = rw
        covered = (m.sum(1) > 1e-6).astype(np.float32)
        in_canvas = np.zeros(out + 2, np.float32)
        in_canvas[1:out + 1] = 1.0
        return (jnp.asarray(m.reshape((out + 2) // 2, 2, src), dtype),
                jnp.asarray(covered.reshape((out + 2) // 2, 2)),
                jnp.asarray(in_canvas.reshape((out + 2) // 2, 2)))

    m2, ch_, inh = canvas_matrix(out_h, new_h, h, top)
    n2, cw_, inw = canvas_matrix(out_w, new_w, w, left)

    x = img.astype(dtype)
    if x.ndim == 3:
        x = x[None]
        squeeze = True
    else:
        squeeze = False
    t = jnp.einsum("iph,bhwc->bipwc", m2, x,
                   preferred_element_type=jnp.float32).astype(dtype)
    y = jnp.einsum("jqw,bipwc->bijpqc", n2, t,
                   preferred_element_type=jnp.float32)
    # fill = pad_value on in-canvas positions not covered by the resized
    # image (the letterbox bands); the 1-px outer ring stays 0 (conv pad)
    covered = ch_[:, None, :, None] * cw_[None, :, None, :]
    canvas = inh[:, None, :, None] * inw[None, :, None, :]
    y = y + (canvas - covered)[None, ..., None] * float(pad_value)
    b = x.shape[0]
    cells = y.reshape(b, (out_h + 2) // 2, (out_w + 2) // 2,
                      4 * img.shape[-1]).astype(dtype)
    if squeeze:
        cells = cells[0]
    return cells, r, (dw, dh)


def letterbox_fast(img: jnp.ndarray, out_hw: tuple[int, int],
                   pad_value: int = 114, dtype=jnp.bfloat16):
    """MXU-matmul letterbox for fused pipelines (see resize_bilinear_mm for
    the <=1-pixel-unit precision note).  Returns float output in `dtype`
    range [0, 255]; same (ratio, dwdh) contract as `letterbox`."""
    out_h, out_w = out_hw
    h, w = img.shape[-3], img.shape[-2]
    new_h, new_w, r, dw, dh, top, left = letterbox_params((h, w), out_hw)
    if (new_h, new_w) == (h, w):
        resized = img.astype(dtype)
    else:
        resized = resize_bilinear_mm(img, (new_h, new_w), dtype).astype(dtype)
    pad_cfg = [(0, 0)] * (img.ndim - 3) + [
        (top, out_h - new_h - top),
        (left, out_w - new_w - left),
        (0, 0),
    ]
    padded = jnp.pad(resized, pad_cfg,
                     constant_values=jnp.asarray(pad_value, dtype))
    return padded, r, (dw, dh)

