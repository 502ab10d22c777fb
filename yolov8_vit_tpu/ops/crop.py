"""Batched crop-and-resize for the second stage, as one gather.

The reference crops each detected box from the original image with PIL and
resizes to 224x224 with cv2 INTER_NEAREST, one box at a time on the host
(`/root/reference/utils/trainClass.py:70-93`, `/root/reference/app.py:39-42`).
Here all K padded boxes of an image are cropped in a single dynamic gather
with static output shape (K, 224, 224, C) — invalid slots gather garbage that
is masked downstream, keeping the whole two-stage pipeline inside one jit.

Nearest-source-index contract: PIL `crop` takes integer box corners and cv2
INTER_NEAREST maps dst->src as floor(dst * src/dst); for an integer box
(x1, y1, x2, y2) with w = x2-x1 we compute the exact rational form

    src_x(dst_x) = x1 + min(floor(dst_x * w // 224), w - 1)

in int32 (box sizes are dynamic, so we cannot pre-bake float64 index tables
the way ops/resize.py does).  cv2 itself evaluates the same quantity in
double precision with two roundings, which can differ by one source pixel
when dst_x*w is an exact multiple of 224 — tests pin our mapping as the
golden one and bound the cv2 deviation to those boundary pixels.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax


def _source_indices(box, out_hw: tuple[int, int], img_hw: tuple[int, int]):
    """Per-box nearest source rows/cols (exact rational mapping)."""
    out_h, out_w = out_hw
    h, w = img_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1)
    bh = jnp.maximum(y2 - y1, 1)
    dx = jnp.arange(out_w, dtype=jnp.int32)
    dy = jnp.arange(out_h, dtype=jnp.int32)
    sx = jnp.clip(x1 + jnp.minimum((dx * bw) // out_w, bw - 1), 0, w - 1)
    sy = jnp.clip(y1 + jnp.minimum((dy * bh) // out_h, bh - 1), 0, h - 1)
    return sy, sx


def crop_and_resize_nearest(img: jnp.ndarray, boxes: jnp.ndarray,
                            out_hw: tuple[int, int]) -> jnp.ndarray:
    """Crop integer xyxy `boxes` (K, 4) from `img` (H, W, C) -> (K, h, w, C).

    Boxes are int32 pixel coords, already clamped to the image.  Empty or
    degenerate boxes (w<=0) produce all-[0,0] gathers — callers mask them.

    Implemented as two one-hot selection matmuls per crop (rows then cols):
    bit-exact vs the gather formulation for uint8 pixels (one-hot rows pick
    single exactly-representable values) but ~14x faster on TPU, where 2-D
    gathers serialize (measured 23ms -> 1.7ms for 32 crops from 720p).
    """
    out_h, out_w = out_hw
    h, w = img.shape[0], img.shape[1]
    boxes = boxes.astype(jnp.int32)
    out_dtype = img.dtype
    if not jnp.issubdtype(out_dtype, jnp.integer):
        # float images would lose precision through the bf16 operands;
        # gathers stay exact there
        return crop_and_resize_nearest_gather(img, boxes, out_hw)
    imf = img.astype(jnp.bfloat16)

    def one(box):
        sy, sx = _source_indices(box, out_hw, (h, w))
        ry = (sy[:, None] == jnp.arange(h)[None, :]).astype(jnp.bfloat16)
        rx = (sx[:, None] == jnp.arange(w)[None, :]).astype(jnp.bfloat16)
        t = jnp.einsum("oh,hwc->owc", ry, imf,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        out = jnp.einsum("pw,owc->opc", rx, t,
                         preferred_element_type=jnp.float32)
        return out.astype(out_dtype)

    return jax.vmap(one)(boxes)


def crop_to_patches(img: jnp.ndarray, boxes: jnp.ndarray,
                    out_hw: tuple[int, int], patch: int) -> jnp.ndarray:
    """`crop_and_resize_nearest` emitting ViT patch-major layout directly:
    (K, n_patches, patch, patch*C) bf16, rows ordered (pi, pj), trailing
    dims (u, (v, c)) — the flax conv patchify's im2col, kept 4-D so the
    lane dim stays the NATIVE (v, c) minor order of the selection einsum.
    Patchify then contracts the (u, (v,c)) dims in one dot_general
    (models/vit.py) with no relayout: a pre-merged (n_patch, p*p*C) form
    measured 0.25 ms of reshape relayout; this form is free and the
    contraction runs at matmul speed (0.027 ms for 32 B/16 crops vs 0.21
    for the conv patchify).

    Same nearest-source contract and uint8-exactness as
    `crop_and_resize_nearest` (one-hot selections of u8 values in bf16)."""
    out_h, out_w = out_hw
    h, w = img.shape[0], img.shape[1]
    boxes = boxes.astype(jnp.int32)
    imf = img.astype(jnp.bfloat16)
    c = img.shape[-1]
    np_h, np_w = out_h // patch, out_w // patch

    def one(box):
        sy, sx = _source_indices(box, out_hw, (h, w))
        ry = (sy[:, None] == jnp.arange(h)[None, :]).astype(jnp.bfloat16)
        rx = (sx[:, None] == jnp.arange(w)[None, :]).astype(jnp.bfloat16)
        ry3 = ry.reshape(np_h, patch, h)
        rx3 = rx.reshape(np_w, patch, w)
        t = jnp.einsum("puh,hwc->puwc", ry3, imf,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = jnp.einsum("qvw,puwc->pquvc", rx3, t,
                       preferred_element_type=jnp.float32)
        # (p, q) and (v, c) merges are contiguous (free); u stays a dim
        return y.reshape(np_h * np_w, patch, patch * c).astype(jnp.bfloat16)

    return jax.vmap(one)(boxes)


def crop_to_patches_i8(images: jnp.ndarray, slot_img: jnp.ndarray,
                       boxes: jnp.ndarray, out_hw: tuple[int, int],
                       patch: int) -> jnp.ndarray:
    """`crop_to_patches` over a BATCH of source images, entirely in int8.

    images (B, H, W, C) uint8; slot_img (K,) i32 selects the source frame
    per crop; boxes (K, 4) int32 xyxy.  Returns (K, n_patches, patch,
    patch*C) int8 holding pixel-128 (range [-128, 127], exact).

    Two wins over the bf16 form (measured, docs/performance.md):
      * the per-slot source-frame gather moves u8/i8 bytes, not bf16
        (4x less HBM traffic than gathering bf16 frames), and
      * the one-hot selection einsums run as int8 MXU dots (2-4x the
        bf16 rate at these shapes), still exact: products of {0,1} with
        centered pixels accumulate in int32.

    The +128 offset and the [-1,1] normalization are folded into the ViT
    patch-embed weights (models/vit.py int8-patch branch), so no float
    pass over the crops exists anywhere."""
    out_h, out_w = out_hw
    b, h, w, c = images.shape
    boxes = boxes.astype(jnp.int32)
    np_h, np_w = out_h // patch, out_w // patch
    imc = (images.astype(jnp.int16) - 128).astype(jnp.int8)

    def one(img_i, box):
        src = imc[img_i]                                   # (H, W, C) i8
        sy, sx = _source_indices(box, out_hw, (h, w))
        ry = (sy[:, None] == jnp.arange(h)[None, :]).astype(jnp.int8)
        rx = (sx[:, None] == jnp.arange(w)[None, :]).astype(jnp.int8)
        ry3 = ry.reshape(np_h, patch, h)
        rx3 = rx.reshape(np_w, patch, w)
        t = jnp.einsum("puh,hwc->puwc", ry3, src,
                       preferred_element_type=jnp.int32).astype(jnp.int8)
        y = jnp.einsum("qvw,puwc->pquvc", rx3, t,
                       preferred_element_type=jnp.int32)
        return y.reshape(np_h * np_w, patch, patch * c).astype(jnp.int8)

    return jax.vmap(one)(slot_img.astype(jnp.int32), boxes)


def crop_and_resize_nearest_gather(img: jnp.ndarray, boxes: jnp.ndarray,
                                   out_hw: tuple[int, int]) -> jnp.ndarray:
    """Gather-based reference implementation (same contract, any dtype)."""
    h, w = img.shape[0], img.shape[1]
    boxes = boxes.astype(jnp.int32)

    def one(box):
        sy, sx = _source_indices(box, out_hw, (h, w))
        return img[sy[:, None], sx[None, :], :]

    return jax.vmap(one)(boxes)
