"""On-device NMS as masked matrix ops with static shapes.

The reference runs NMS twice:

 1. In-engine `EfficientNMS_TRT` (IoU .65, conf .25, topk 100, class-aware,
    background -1, box_coding xyxy) emitting fixed-size
    (num_dets, bboxes[topk], scores[topk], labels[topk])
    (`/root/reference/docs/YOLO_TensorRT_Technical.md:106-151`,
    `/root/reference/tech.md:41-47`).  -> `efficient_nms_scan`, a Pallas
    argmax-selection kernel over the FULL multi-label candidate pool.
    (The original masked-matrix formulation was retired to
    tests/masked_nms_oracle.py: with an explicit small pre_topk it could
    truncate candidates the full-candidate kernel keeps and diverge on
    dense scenes; it survives as the tests' independent oracle.)
 2. A custom second pass that filters conf > .35, orders boxes by *area*
    descending, and suppresses at IoU .45 to merge duplicate covers
    (`/root/reference/README.md:41-84`).  -> `area_sorted_nms`.

Both are greedy sequential algorithms; on TPU both run as Pallas kernels
that hold every candidate in VMEM and per iteration argmax-select the best
remaining row (trip count == boxes kept, not pool size), with all shapes
static — the topk=100 padded outputs keep every downstream shape static
(the reference engine pads to topk=100 the same way).  `area_sorted_nms`
also keeps an argsort + `lax.fori_loop` masked formulation
(`impl="argsort"`) used by the cross-check tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov8_vit_tpu.ops.boxes import box_iou, box_area
from yolov8_vit_tpu.ops.lowering import interpret_default


def _fold_lanes(a: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """(N,) -> (ceil(N/128), 128) f32, padding with `fill`: the scan-NMS
    kernels' input layout (full 8-sublane x 128-lane VPU tiles)."""
    n = a.shape[0]
    kp = -(-n // 128) * 128
    if kp != n:
        a = jnp.pad(a, (0, kp - n), constant_values=fill)
    return a.reshape(kp // 128, 128).astype(jnp.float32)


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


def _nms_argmax_kernel(side_ref, x1_ref, y1_ref, x2_ref, y2_ref,
                       lab_ref, sc_ref, out_ref, nd_ref, scs, *,
                       iou_threshold: float, score_threshold: float,
                       max_output: int):
    """Greedy NMS with in-kernel argmax selection, all candidates in VMEM.

    Instead of pre-sorting 8400 anchors, each iteration picks the highest
    remaining score (ties broken by lowest anchor index, matching a stable
    descending sort), emits it into the next output slot, and *removes* every
    candidate it suppresses from the pool — so the trip count equals the
    number of boxes kept (<= max_output even in adversarially dense scenes),
    and every anchor above the score threshold participates in suppression,
    exactly like the TRT plugin's full-candidate greedy
    (`/root/reference/docs/YOLO_TensorRT_Technical.md:106-135`).

    Candidate arrays arrive folded to (Kp/128, 128) so VPU ops use all 8
    sublanes.  Outputs are written score-descending directly into `out_ref`
    rows (x1, y1, x2, y2, score, label), eliminating the output top_k.
    """
    side = side_ref[0, 0]
    r, l = sc_ref.shape
    outl = out_ref.shape[-1]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (r, l), 0) * l +
            jax.lax.broadcasted_iota(jnp.int32, (r, l), 1))
    off = lab_ref[...] * side          # per-class coordinate offset (IoU only)
    x1o = x1_ref[...] + off
    y1o = y1_ref[...] + off
    x2o = x2_ref[...] + off
    y2o = y2_ref[...] + off
    area = jnp.maximum(x2o - x1o, 0.0) * jnp.maximum(y2o - y1o, 0.0)
    out_slot = jax.lax.broadcasted_iota(jnp.int32, (1, outl), 1)
    out_ref[...] = jnp.zeros((8, outl), jnp.float32)
    out_ref[5:6, :] = jnp.full((1, outl), -1.0, jnp.float32)  # label pad
    scs[...] = sc_ref[...]

    def cond(c):
        kept, m = c
        return (m > score_threshold) & (kept < max_output)

    def body(c):
        kept, m = c
        sel = scs[...] == m
        i_sel = jnp.min(jnp.where(sel, flat, jnp.int32(2 ** 30)))
        onehot = (flat == i_sel).astype(jnp.float32)
        cx1 = jnp.sum(x1_ref[...] * onehot)
        cy1 = jnp.sum(y1_ref[...] * onehot)
        cx2 = jnp.sum(x2_ref[...] * onehot)
        cy2 = jnp.sum(y2_ref[...] * onehot)
        clab = jnp.sum(lab_ref[...] * onehot)
        coff = clab * side
        iw = jnp.maximum(jnp.minimum(x2o, cx2 + coff) -
                         jnp.maximum(x1o, cx1 + coff), 0.0)
        ih = jnp.maximum(jnp.minimum(y2o, cy2 + coff) -
                         jnp.maximum(y1o, cy1 + coff), 0.0)
        inter = iw * ih
        c_area = jnp.maximum(cx2 - cx1, 0.0) * jnp.maximum(cy2 - cy1, 0.0)
        iou = inter / jnp.maximum(area + c_area - inter, 1e-9)
        kill = (iou > iou_threshold) | (flat == i_sel)
        scs[...] = jnp.where(kill, -1.0, scs[...])
        slot = out_slot == kept
        out_ref[0:1, :] = jnp.where(slot, cx1, out_ref[0:1, :])
        out_ref[1:2, :] = jnp.where(slot, cy1, out_ref[1:2, :])
        out_ref[2:3, :] = jnp.where(slot, cx2, out_ref[2:3, :])
        out_ref[3:4, :] = jnp.where(slot, cy2, out_ref[3:4, :])
        out_ref[4:5, :] = jnp.where(slot, m, out_ref[4:5, :])
        out_ref[5:6, :] = jnp.where(slot, clab, out_ref[5:6, :])
        return kept + 1, jnp.max(scs[...])

    kept, _ = jax.lax.while_loop(cond, body,
                                 (jnp.int32(0), jnp.max(scs[...])))
    nd_ref[0, 0] = kept


def _nms_argmax_kernel_ml(x1_ref, y1_ref, x2_ref, y2_ref, sc_ref, out_ref,
                          nd_ref, scs, *, iou_threshold: float,
                          score_threshold: float, max_output: int):
    """Multi-label `_nms_argmax_kernel`: candidates are (class, anchor)
    pairs held as per-class score PLANES (C, R, 128) over shared
    anchor-level coordinates (R, 128).

    Exact plugin class-aware semantics with no coordinate-offset trick:
    suppression kills (iou > thr) entries in the SELECTED class's plane
    only, and the expensive IoU arithmetic runs on the anchor grid once
    per iteration — the C*x-sized ops are simple compares/selects."""
    c, r, l = sc_ref.shape
    outl = out_ref.shape[-1]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (c, r, l), 0)
    flat = (k_iota * (r * l) +
            jax.lax.broadcasted_iota(jnp.int32, (c, r, l), 1) * l +
            jax.lax.broadcasted_iota(jnp.int32, (c, r, l), 2))
    x1, y1 = x1_ref[...], y1_ref[...]
    x2, y2 = x2_ref[...], y2_ref[...]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    out_slot = jax.lax.broadcasted_iota(jnp.int32, (1, outl), 1)
    out_ref[...] = jnp.zeros((8, outl), jnp.float32)
    out_ref[5:6, :] = jnp.full((1, outl), -1.0, jnp.float32)  # label pad
    scs[...] = sc_ref[...]

    def cond(carry):
        kept, m = carry
        return (m > score_threshold) & (kept < max_output)

    def body(carry):
        kept, m = carry
        sel = scs[...] == m
        i_sel = jnp.min(jnp.where(sel, flat, jnp.int32(2 ** 30)))
        onehot3 = (flat == i_sel).astype(jnp.float32)
        oh_anchor = jnp.sum(onehot3, axis=0)              # (r, l)
        cx1 = jnp.sum(x1 * oh_anchor)
        cy1 = jnp.sum(y1 * oh_anchor)
        cx2 = jnp.sum(x2 * oh_anchor)
        cy2 = jnp.sum(y2 * oh_anchor)
        clab = jnp.sum(k_iota.astype(jnp.float32) * onehot3)
        iw = jnp.maximum(jnp.minimum(x2, cx2) - jnp.maximum(x1, cx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, cy2) - jnp.maximum(y1, cy1), 0.0)
        inter = iw * ih
        c_area = jnp.maximum(cx2 - cx1, 0.0) * jnp.maximum(cy2 - cy1, 0.0)
        iou = inter / jnp.maximum(area + c_area - inter, 1e-9)  # (r, l)
        kill = ((iou > iou_threshold)[None, :, :] &
                (k_iota == clab.astype(jnp.int32))) | (flat == i_sel)
        scs[...] = jnp.where(kill, -1.0, scs[...])
        slot = out_slot == kept
        out_ref[0:1, :] = jnp.where(slot, cx1, out_ref[0:1, :])
        out_ref[1:2, :] = jnp.where(slot, cy1, out_ref[1:2, :])
        out_ref[2:3, :] = jnp.where(slot, cx2, out_ref[2:3, :])
        out_ref[3:4, :] = jnp.where(slot, cy2, out_ref[3:4, :])
        out_ref[4:5, :] = jnp.where(slot, m, out_ref[4:5, :])
        out_ref[5:6, :] = jnp.where(slot, clab, out_ref[5:6, :])
        return kept + 1, jnp.max(scs[...])

    kept, _ = jax.lax.while_loop(cond, body,
                                 (jnp.int32(0), jnp.max(scs[...])))
    nd_ref[0, 0] = kept


def efficient_nms_scan(boxes: jnp.ndarray, scores: jnp.ndarray, *,
                       iou_threshold: float = 0.65,
                       score_threshold: float = 0.25,
                       max_output: int = 100,
                       multi_label: bool = True,
                       interpret: bool | None = None):
    """EfficientNMS with FULL-candidate greedy semantics (Pallas kernel).

    Same contract as the masked-matrix oracle formulation
    (tests/masked_nms_oracle.py), but every candidate above the score
    threshold participates in suppression (no pre_topk truncation), and the
    sequential part runs inside one Pallas program whose trip count is the
    number of kept boxes (<= max_output) — no anchor sort, no output
    top_k, no fixed 512-iteration scan.  With multi_label (plugin parity)
    the pool is every (anchor, class) pair, held as per-class score planes
    over shared anchor coordinates (`_nms_argmax_kernel_ml`) so the IoU
    arithmetic stays anchor-sized.
    """
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = interpret_default()
    n, nc = scores.shape
    kp = -(-n // 128) * 128
    outl = -(-max_output // 128) * 128
    fold = _fold_lanes

    if multi_label:
        sc_planes = jnp.stack([fold(scores[:, k], fill=-1.0)
                               for k in range(nc)])
        out, nd = pl.pallas_call(
            functools.partial(_nms_argmax_kernel_ml,
                              iou_threshold=iou_threshold,
                              score_threshold=score_threshold,
                              max_output=max_output),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((8, outl), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((nc, kp // 128, 128), jnp.float32)],
            interpret=interpret,
        )(fold(boxes[:, 0]), fold(boxes[:, 1]), fold(boxes[:, 2]),
          fold(boxes[:, 3]), sc_planes)
        num_dets = nd[0, 0]
        picked = jnp.arange(max_output) < num_dets
        out_boxes = out[0:4, :max_output].T
        out_scores = out[4, :max_output]
        out_labels = jnp.where(picked,
                               out[5, :max_output].astype(jnp.int32), -1)
        return num_dets, out_boxes, out_scores, out_labels

    per_score = jnp.max(scores, axis=-1)
    per_label = jnp.argmax(scores, axis=-1).astype(jnp.float32)
    # class-band stride 2*side: boxes may have negative coords (unclamped
    # DFL decode), so each band must cover [-side+1, side-1]
    side = (2.0 * (jnp.max(jnp.abs(boxes)) + 1.0)).reshape(1, 1)
    out, nd = pl.pallas_call(
        functools.partial(_nms_argmax_kernel, iou_threshold=iou_threshold,
                          score_threshold=score_threshold,
                          max_output=max_output),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((8, outl), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((kp // 128, 128), jnp.float32)],
        interpret=interpret,
    )(side, fold(boxes[:, 0]), fold(boxes[:, 1]), fold(boxes[:, 2]),
      fold(boxes[:, 3]), fold(per_label), fold(per_score, fill=-1.0))

    num_dets = nd[0, 0]
    picked = jnp.arange(max_output) < num_dets
    out_boxes = out[0:4, :max_output].T
    out_scores = out[4, :max_output]
    out_labels = jnp.where(picked, out[5, :max_output].astype(jnp.int32), -1)
    return num_dets, out_boxes, out_scores, out_labels


_KILLED = -1e9


def _mask_scan_kernel(x1_ref, y1_ref, x2_ref, y2_ref, pri_ref,
                      keep_ref, pris, *, iou_threshold: float):
    """Greedy class-agnostic NMS emitting a keep MASK over input rows.

    Argmax-selection variant of `_nms_argmax_kernel` for the second-stage
    pass: priorities of invalid rows arrive as `_KILLED`; each iteration
    keeps the highest-priority live row (ties -> lowest index, pinning the
    stable-sort order) and kills everything it overlaps.
    """
    r, l = pri_ref.shape
    flat = (jax.lax.broadcasted_iota(jnp.int32, (r, l), 0) * l +
            jax.lax.broadcasted_iota(jnp.int32, (r, l), 1))
    x1, y1, x2, y2 = x1_ref[...], y1_ref[...], x2_ref[...], y2_ref[...]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    keep_ref[...] = jnp.zeros((r, l), jnp.float32)
    pris[...] = pri_ref[...]

    def cond(m):
        return m > _KILLED / 2

    def body(m):
        sel = pris[...] == m
        i_sel = jnp.min(jnp.where(sel, flat, jnp.int32(2 ** 30)))
        onehot = (flat == i_sel).astype(jnp.float32)
        cx1 = jnp.sum(x1 * onehot)
        cy1 = jnp.sum(y1 * onehot)
        cx2 = jnp.sum(x2 * onehot)
        cy2 = jnp.sum(y2 * onehot)
        c_area = jnp.maximum(cx2 - cx1, 0.0) * jnp.maximum(cy2 - cy1, 0.0)
        iw = jnp.maximum(jnp.minimum(x2, cx2) - jnp.maximum(x1, cx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, cy2) - jnp.maximum(y1, cy1), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(area + c_area - inter, 1e-9)
        kill = (iou > iou_threshold) | (flat == i_sel)
        pris[...] = jnp.where(kill, _KILLED, pris[...])
        keep_ref[...] = keep_ref[...] + onehot
        return jnp.max(pris[...])

    jax.lax.while_loop(cond, body, jnp.max(pris[...]))


def area_sorted_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, *,
                    iou_threshold: float = 0.45,
                    score_threshold: float = 0.35,
                    sort_by: str = "area",
                    impl: str = "scan",
                    interpret: bool | None = None):
    """The reference's custom second-stage NMS, fully on device.

    Filters conf > theta_c (default .35), orders remaining boxes by area
    descending (doc behavior, `/root/reference/README.md:44-57`; pass
    sort_by="score" for the README code-snippet variant), suppresses at
    IoU .45, class-agnostic.  Operates in-place on the padded topk slots:
    returns a keep mask aligned with the input rows (original row order is
    preserved for downstream crop indexing).

    impl="scan" (default) runs the Pallas argmax-selection kernel with a
    trip count equal to the kept-box count; "argsort" is the sort +
    fori_loop formulation (identical results, pinned by tests).
    """
    valid = valid & (scores > score_threshold)
    key = box_area(boxes) if sort_by == "area" else scores

    if impl == "scan":
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if interpret is None:
            interpret = interpret_default()
        n = boxes.shape[0]
        kp = -(-n // 128) * 128
        fold = _fold_lanes
        pri = jnp.where(valid, key.astype(jnp.float32), _KILLED)
        keep = pl.pallas_call(
            functools.partial(_mask_scan_kernel,
                              iou_threshold=iou_threshold),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((kp // 128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((kp // 128, 128), jnp.float32)],
            interpret=interpret,
        )(fold(boxes[:, 0]), fold(boxes[:, 1]), fold(boxes[:, 2]),
          fold(boxes[:, 3]), fold(pri, fill=_KILLED))
        return keep.reshape(-1)[:n] > 0.5

    order = jnp.argsort(jnp.where(valid, key, -jnp.inf), descending=True)
    iou = box_iou(boxes[order], boxes[order])
    keep_sorted = _greedy_suppress(iou, valid[order], iou_threshold)
    # scatter back to original row positions
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep
