"""NMS / box-op parity vs golden numpy greedy references (SURVEY.md §7
"NMS parity" — kept indices must match exactly, including tie order)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu.ops import (
    box_iou, box_area, area_sorted_nms, inflate_boxes, unletterbox_boxes,
)
# the masked formulation is tests-only now (retired from production decode;
# it remains the independently-derived oracle the kernels are checked with)
from masked_nms_oracle import efficient_nms


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _np_greedy_nms(boxes, scores, iou_t):
    """Golden greedy NMS: score-descending, suppressed boxes don't suppress."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = _np_iou(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_t]
    return keep


def _rand_boxes(n, seed, img=640):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, img - 40, (n, 2))
    wh = rng.uniform(8, 200, (n, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, img)], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_box_iou_matches_numpy():
    a, _ = _rand_boxes(17, 0)
    b, _ = _rand_boxes(9, 1)
    np.testing.assert_allclose(
        np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))),
        _np_iou(a, b), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_efficient_nms_class_agnostic_matches_greedy(seed):
    boxes, scores = _rand_boxes(300, seed)
    conf, iou_t = 0.25, 0.65
    cls_scores = scores[:, None] * np.array([[1.0]], np.float32)  # 1 class
    num, ob, osc, ol = jax.jit(
        lambda b, s: efficient_nms(b, s, iou_threshold=iou_t,
                                   score_threshold=conf, max_output=100,
                                   pre_topk=300, class_aware=False)
    )(jnp.asarray(boxes), jnp.asarray(cls_scores))
    mask = scores > conf
    ref_keep = _np_greedy_nms(boxes[mask], scores[mask], iou_t)
    ref_boxes = boxes[mask][ref_keep]
    ref_scores = scores[mask][ref_keep]
    n = int(num)
    assert n == len(ref_keep[:100])
    np.testing.assert_allclose(np.asarray(osc)[:n], ref_scores[:100], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ob)[:n], ref_boxes[:100], rtol=1e-6)


@pytest.mark.parametrize("seed", [5, 6])
def test_efficient_nms_class_aware(seed):
    boxes, scores = _rand_boxes(200, seed)
    rng = np.random.default_rng(seed + 100)
    labels = rng.integers(0, 5, 200)
    cls_scores = np.zeros((200, 5), np.float32)
    cls_scores[np.arange(200), labels] = scores
    num, ob, osc, ol = efficient_nms(
        jnp.asarray(boxes), jnp.asarray(cls_scores),
        iou_threshold=0.65, score_threshold=0.25, max_output=100, pre_topk=200)
    # golden: per-class greedy, then merge by score
    kept = []
    for c in range(5):
        m = (labels == c) & (scores > 0.25)
        idx = np.where(m)[0]
        for k in _np_greedy_nms(boxes[idx], scores[idx], 0.65):
            kept.append(idx[k])
    kept = sorted(kept, key=lambda i: -scores[i])[:100]
    n = int(num)
    assert n == len(kept)
    np.testing.assert_allclose(np.asarray(osc)[:n], scores[kept], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ol)[:n], labels[kept])


def test_efficient_nms_padding_contract():
    boxes, scores = _rand_boxes(50, 9)
    cls_scores = np.zeros((50, 5), np.float32)
    cls_scores[:, 2] = scores * 0.2  # all below conf threshold
    num, ob, osc, ol = efficient_nms(jnp.asarray(boxes), jnp.asarray(cls_scores))
    assert int(num) == 0
    assert np.all(np.asarray(ol) == -1)
    assert np.all(np.asarray(osc) == 0)
    assert ob.shape == (100, 4)


@pytest.mark.parametrize("sort_by", ["area", "score"])
def test_area_sorted_nms_matches_greedy(sort_by):
    boxes, scores = _rand_boxes(64, 11)
    valid = np.ones(64, bool)
    keep = area_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                           jnp.asarray(valid), iou_threshold=0.45,
                           score_threshold=0.35, sort_by=sort_by)
    m = scores > 0.35
    idx = np.where(m)[0]
    key = (box_area(jnp.asarray(boxes)).tolist() if sort_by == "area"
           else scores)
    key = np.asarray(key)[idx]
    ref_keep_local = _np_greedy_nms(boxes[idx], key, 0.45)
    ref = np.zeros(64, bool)
    ref[idx[ref_keep_local]] = True
    np.testing.assert_array_equal(np.asarray(keep), ref)


def test_area_sorted_nms_respects_valid_mask():
    boxes, scores = _rand_boxes(16, 3)
    scores[:] = 0.9
    valid = np.zeros(16, bool)
    valid[3] = True
    keep = area_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                           jnp.asarray(valid))
    assert np.asarray(keep).sum() == 1 and bool(keep[3])


def test_inflate_boxes_matches_reference_crop_math():
    """Eval-time inflation: +/- (side//10)//2, clamped
    (/root/reference/utils/trainClass.py:85-91)."""
    boxes = np.array([[100, 50, 205, 182],   # w=105, h=132
                      [0, 0, 9, 9],          # tiny: dis=0 -> unchanged
                      [600, 600, 640, 640]], np.float32)
    img_wh = np.array([640.0, 640.0], np.float32)
    out = np.asarray(inflate_boxes(jnp.asarray(boxes),
                                   jnp.asarray(img_wh)[None, :]))

    def ref_one(x1, y1, x2, y2, w, h):
        dis_x = (x2 - x1) // 10
        dis_y = (y2 - y1) // 10
        return (max(0, x1 - dis_x // 2), max(0, y1 - dis_y // 2),
                min(w, x2 + dis_x // 2), min(h, y2 + dis_y // 2))

    for i, b in enumerate(boxes):
        ref = ref_one(int(b[0]), int(b[1]), int(b[2]), int(b[3]), 640, 640)
        np.testing.assert_allclose(out[i], ref)


def test_unletterbox_roundtrip():
    boxes = jnp.asarray([[100.0, 120.0, 300.0, 280.0]])
    out = unletterbox_boxes(boxes, 0.5, (20.0, 40.0))
    np.testing.assert_allclose(np.asarray(out), [[160.0, 160.0, 560.0, 480.0]])


def test_decode_predictions_matches_masked_oracle():
    """Production decode (scan kernel) must match an independently-composed
    decode that swaps in the tests-only masked oracle NMS — same DFL/sigmoid
    front end, different suppression algorithm.  The retired 'masked'
    nms_impl value itself must be rejected (it could silently truncate the
    multi-label pool; round-4 VERDICT item 7)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.yolov8 import (YOLOv8, YOLOV8_VARIANTS,
                                              flatten_head_outputs)
    from yolov8_vit_tpu.ops import dfl_decode, make_anchors
    from yolov8_vit_tpu.runtime.detector import decode_predictions

    spec = dataclasses.replace(YOLOV8_VARIANTS["n"], num_classes=5)
    model = YOLOv8(spec, fused=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(3),
                                 jnp.zeros((1, 64, 64, 3)))
    x = jnp.asarray(np.random.default_rng(4).random((2, 64, 64, 3)),
                    jnp.float32)
    head = model.apply(params, x)
    # conf 1e-4 makes every (anchor, class) pair a candidate (multi-label
    # plugin semantics): 84 anchors x 5 classes
    cfg = DetectConfig(input_size=(64, 64), variant="n", nms_topk=16,
                       nms_conf=1e-4, nms_impl="scan")
    a = jax.tree.map(np.asarray, decode_predictions(head, cfg))

    box_dist, cls_logits = flatten_head_outputs(head)
    anchors, stride = make_anchors(cfg.input_size, cfg.strides)
    boxes = dfl_decode(box_dist.astype(jnp.float32), anchors, stride,
                       cfg.reg_max)
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    b = jax.tree.map(np.asarray, jax.vmap(
        lambda bb, ss: efficient_nms(bb, ss, iou_threshold=cfg.nms_iou,
                                     score_threshold=cfg.nms_conf,
                                     max_output=cfg.nms_topk))(boxes, scores))
    for name, x1, x2 in zip(("num", "boxes", "scores", "labels"), a, b):
        np.testing.assert_array_equal(x1, x2, err_msg=name)

    with pytest.raises(ValueError, match="retired"):
        decode_predictions(head, dataclasses.replace(cfg, nms_impl="masked"))
