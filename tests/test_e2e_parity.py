"""END-TO-END numerical parity: the fused TPU pipeline vs an independent
torch+numpy replication of the reference flow on the SAME weights.

This is the north-star check (BASELINE.md: "IoU-identical boxes,
kept-indices, and class outputs vs the PyTorch reference"): letterbox ->
YOLOv8 -> DFL -> EfficientNMS -> un-letterbox -> conf filter -> area NMS ->
inflate -> crop -> ViT -> argmax, computed two completely different ways.
"""
import dataclasses

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.models.yolov8 import YOLOv8Spec
from yolov8_vit_tpu.runtime.convert import convert_yolov8, convert_vit_wrapper

from torch_refs import UYOLOv8, TimmViT, NetworkWrapper

DET_SPEC = YOLOv8Spec(0.33, 0.125, 1024, num_classes=5)
DET_CFG = DetectConfig(input_size=(64, 64), variant="n", nms_pre_topk=84,
                       nms_topk=16)
VIT = dict(img_size=32, patch=8, dim=64, depth=2, heads=4)


def _torch_reference_two_stage(img_u8, det_model, vit_model):
    """The reference flow, torch+numpy, per SURVEY.md §3.1."""
    import cv2
    h, w = img_u8.shape[:2]
    in_h, in_w = DET_CFG.input_size

    # letterbox (cv2 float semantics) + blob
    r = min(in_w / w, in_h / h)
    nw, nh = round(w * r), round(h * r)
    resized = cv2.resize(img_u8.astype(np.float32), (nw, nh),
                         interpolation=cv2.INTER_LINEAR)
    dw, dh = (in_w - nw) / 2, (in_h - nh) / 2
    top, left = round(dh - 0.1), round(dw - 0.1)
    lb = np.full((in_h, in_w, 3), 114.0, np.float32)
    lb[top:top + nh, left:left + nw] = resized
    blob = lb[None].transpose(0, 3, 1, 2) / 255.0

    # detect + DFL decode
    with torch.no_grad():
        levels = det_model(torch.from_numpy(blob.astype(np.float32)))
    boxes_all, scores_all = [], []
    for (bd, cl), stride in zip(levels, (8, 16, 32)):
        bd = bd[0].permute(1, 2, 0).numpy()        # (H, W, 64)
        cl = cl[0].permute(1, 2, 0).numpy()        # (H, W, 5)
        hh, ww = bd.shape[:2]
        d = bd.reshape(hh * ww, 4, 16)
        p = np.exp(d - d.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ltrb = p @ np.arange(16, dtype=np.float32)
        gy, gx = np.mgrid[0:hh, 0:ww]
        anchors = np.stack([gx.ravel() + 0.5, gy.ravel() + 0.5], -1)
        xy1 = anchors - ltrb[:, :2]
        xy2 = anchors + ltrb[:, 2:]
        boxes_all.append(np.concatenate([xy1, xy2], -1) * stride)
        scores_all.append(1 / (1 + np.exp(-cl.reshape(hh * ww, 5))))
    boxes = np.concatenate(boxes_all)
    scores = np.concatenate(scores_all)

    # EfficientNMS-equivalent: class-aware greedy over every
    # (anchor, class) candidate above conf .25, IoU .65 (TRT plugin
    # contract — an anchor with two classes above threshold is TWO
    # candidates; suppression only within the same class)
    n_anchor, n_cls = scores.shape
    sc = scores.T.reshape(-1)              # class-major pool (kernel order)
    lab = np.repeat(np.arange(n_cls), n_anchor)
    cboxes = np.tile(boxes, (n_cls, 1))
    order = np.argsort(-sc, kind="stable")
    kept = []
    for i in order:
        if sc[i] <= DET_CFG.nms_conf:
            continue
        ok = True
        for j in kept:
            if lab[j] != lab[i]:
                continue
            bi, bj = cboxes[i], cboxes[j]
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
            aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / max(ai + aj - inter, 1e-9) > DET_CFG.nms_iou:
                ok = False
                break
        if ok:
            kept.append(i)
    kept = kept[:DET_CFG.nms_topk]

    # un-letterbox + clip
    out_boxes = (cboxes[kept] - np.array([dw, dh, dw, dh])) / r
    out_boxes = out_boxes.clip([0, 0, 0, 0], [w, h, w, h])
    out_scores, out_labels = sc[kept], lab[kept]

    # conf>.35 + area-sorted NMS (class-agnostic)
    m = out_scores > DET_CFG.conf_second
    cand = np.where(m)[0]
    areas = (out_boxes[cand, 2] - out_boxes[cand, 0]) * \
            (out_boxes[cand, 3] - out_boxes[cand, 1])
    cand = cand[np.argsort(-areas, kind="stable")]
    final = []
    for i in cand:
        ok = True
        for j in final:
            bi, bj = out_boxes[i], out_boxes[j]
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
            aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / max(ai + aj - inter, 1e-9) > DET_CFG.custom_nms_iou:
                ok = False
                break
        if ok:
            final.append(i)

    # inflate + crop + classify
    results = []
    for i in final:
        x1, y1, x2, y2 = np.round(out_boxes[i]).astype(int)
        dis_x, dis_y = (x2 - x1) // 10, (y2 - y1) // 10
        x1c, y1c = max(0, x1 - dis_x // 2), max(0, y1 - dis_y // 2)
        x2c, y2c = min(w, x2 + dis_x // 2), min(h, y2 + dis_y // 2)
        x2c, y2c = max(x2c, x1c + 1), max(y2c, y1c + 1)
        crop = img_u8[y1c:y2c, x1c:x2c]
        bh, bw = crop.shape[:2]
        s = VIT["img_size"]
        sx = np.minimum(np.arange(s) * bw // s, bw - 1)
        sy = np.minimum(np.arange(s) * bh // s, bh - 1)
        crop224 = crop[sy[:, None], sx[None, :]]
        t = crop224.astype(np.float32) / 255.0 * 2 - 1
        with torch.no_grad():
            logits = vit_model(torch.from_numpy(
                t.transpose(2, 0, 1)[None]))
        results.append({"box": out_boxes[i], "det_label": int(out_labels[i]),
                        "det_score": float(out_scores[i]),
                        "cls": int(logits.argmax().item())})
    return results


@pytest.mark.parametrize("seed", list(range(16)))
def test_full_two_stage_matches_torch_reference(seed):
    """Seed-fuzzed north-star gate: 16 random weight draws x 4 input
    shapes (aspect ratios fuzz the letterbox ratio/pad and the
    un-letterbox coordinate math; shapes repeat every 4 seeds so the
    fused graph compiles once per shape)."""
    torch.manual_seed(seed)
    det_t = UYOLOv8(DET_SPEC, num_classes=5).eval()
    # give BN non-trivial stats
    g = torch.Generator().manual_seed(seed)
    for m in det_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    vit_t = NetworkWrapper(TimmViT(num_classes=40, **VIT), 5,
                           backbone_classes=40).eval()

    det_params = convert_yolov8(
        {k: v.numpy() for k, v in det_t.state_dict().items()})
    vit_params = convert_vit_wrapper(
        {k: v.numpy() for k, v in vit_t.state_dict().items()},
        depth=VIT["depth"])

    rng = np.random.default_rng(seed)
    # 4 aspect ratios: wide, tall, square, and a non-multiple-of-8 odd
    # size (stresses letterbox rounding) — cycled so shapes recompile only
    # once across the 16 seeds
    h_w = [(48, 80), (80, 48), (64, 64), (50, 94)][seed % 4]
    img = rng.integers(0, 256, (*h_w, 3), dtype=np.uint8)

    ref = _torch_reference_two_stage(img, det_t, vit_t)

    pipe = TwoStagePipeline(
        det_cfg=DET_CFG,
        vit_spec=ViTSpec(backbone_classes=40, **VIT),
        classify_budget=8, dtype=jnp.float32)
    import yolov8_vit_tpu.models.yolov8 as y8
    orig = y8.YOLOV8_VARIANTS["n"]
    y8.YOLOV8_VARIANTS["n"] = DET_SPEC
    try:
        out = jax.jit(pipe.__call__)(
            {"det": det_params, "vit": vit_params}, jnp.asarray(img[None]))
    finally:
        y8.YOLOV8_VARIANTS["n"] = orig
    out = jax.tree.map(np.asarray, out)

    ours_final = np.nonzero(out["final_valid"][0])[0]
    assert len(ours_final) == len(ref), (len(ours_final), len(ref))

    # match by nearest box; require IoU-identical (tolerance fp only)
    for k in ours_final:
        box = out["boxes"][0][k]
        dists = [np.abs(r["box"] - box).max() for r in ref]
        j = int(np.argmin(dists))
        r = ref[j]
        np.testing.assert_allclose(box, r["box"], rtol=1e-3, atol=0.1)
        assert int(out["det_labels"][0][k]) == r["det_label"]
        assert abs(float(out["det_scores"][0][k]) - r["det_score"]) < 1e-3
        if int(out["cls_labels"][0][k]) >= 0:
            assert int(out["cls_labels"][0][k]) == r["cls"]


def test_full_two_stage_dense_multi_image_batch():
    """Round-1 weakness: parity was only checked on one sparse image.
    Here: a 3-image batch, class-head weights calibrated so scores spread
    (random-init logits otherwise collapse onto the bias priors), and a
    low conf threshold -> dozens of overlapping above-threshold candidates
    per image stress the full NMS/crop/classify chain against the torch
    reference, image by image."""
    global DET_CFG
    torch.manual_seed(11)
    det_t = UYOLOv8(DET_SPEC, num_classes=5).eval()
    g = torch.Generator().manual_seed(11)
    for m in det_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)

    # calibrate the cls-head scale so per-anchor logits spread ~2 sigma
    rng = np.random.default_rng(5)
    probe = rng.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        lv = [cl.numpy() for _, cl in det_t(torch.from_numpy(probe))]
    spread = float(np.concatenate([v.ravel() - v.mean() for v in lv]).std())
    scale = 2.0 / max(spread, 1e-12)
    with torch.no_grad():
        for i in range(3):
            det_t.model["22"].cv3[i][2].weight.mul_(scale)
    vit_t = NetworkWrapper(TimmViT(num_classes=40, **VIT), 5,
                           backbone_classes=40).eval()

    det_params = convert_yolov8(
        {k: v.numpy() for k, v in det_t.state_dict().items()})
    vit_params = convert_vit_wrapper(
        {k: v.numpy() for k, v in vit_t.state_dict().items()},
        depth=VIT["depth"])

    cfg = dataclasses.replace(DET_CFG, nms_conf=0.05, nms_topk=32,
                              conf_second=0.1)
    imgs = rng.integers(0, 256, (3, 48, 80, 3), dtype=np.uint8)

    # torch reference per image (module-level cfg monkeypatch, as the
    # reference flow reads DET_CFG)
    saved = DET_CFG
    refs = []
    try:
        DET_CFG = cfg  # noqa: PLW0603
        for b in range(3):
            refs.append(_torch_reference_two_stage(imgs[b], det_t, vit_t))
    finally:
        DET_CFG = saved

    total_ref = sum(len(r) for r in refs)
    assert total_ref >= 3, f"no final detections to compare ({total_ref})"

    pipe = TwoStagePipeline(
        det_cfg=cfg, vit_spec=ViTSpec(backbone_classes=40, **VIT),
        classify_budget=max(total_ref // 3 + 2, 4), dtype=jnp.float32)
    import yolov8_vit_tpu.models.yolov8 as y8
    orig = y8.YOLOV8_VARIANTS["n"]
    y8.YOLOV8_VARIANTS["n"] = DET_SPEC
    try:
        out = jax.jit(pipe.__call__)(
            {"det": det_params, "vit": vit_params}, jnp.asarray(imgs))
    finally:
        y8.YOLOV8_VARIANTS["n"] = orig
    out = jax.tree.map(np.asarray, out)
    # density check: the stage-1 NMS must have been fed a crowded scene
    # (the area-sorted second pass then merges overlapping candidates)
    assert int(out["num_dets"].sum()) >= 20, out["num_dets"]

    for b in range(3):
        ref = refs[b]
        ours_final = np.nonzero(out["final_valid"][b])[0]
        assert len(ours_final) == len(ref), \
            f"img{b}: {len(ours_final)} vs {len(ref)}"
        for k in ours_final:
            box = out["boxes"][b][k]
            dists = [np.abs(r["box"] - box).max() for r in ref]
            j = int(np.argmin(dists))
            r = ref[j]
            np.testing.assert_allclose(box, r["box"], rtol=1e-3, atol=0.1)
            assert int(out["det_labels"][b][k]) == r["det_label"]
            assert abs(float(out["det_scores"][b][k]) - r["det_score"]) < 1e-3
            if int(out["cls_labels"][b][k]) >= 0:
                assert int(out["cls_labels"][b][k]) == r["cls"]
