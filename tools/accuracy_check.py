"""Accuracy parity checker: fused TPU pipeline vs the host reference flow.

Given the ORIGINAL torch checkpoints (ultralytics .pt + Network_Wrapper
.pth), converts them once and runs every image through TWO independent
implementations — the single-graph fused pipeline (models/two_stage.py)
and the inferdet-parity host path (serve/infer.py: cv2 letterbox, engine
calls, host NMS) — then reports detection-count agreement, greedy-matched
box IoU, and class agreement: the user-level version of
tests/test_e2e_parity.py for real weights.  (Torch-side goldens for the
same flow are pinned in-repo by tests/test_e2e_parity.py.)

    python tools/accuracy_check.py --det best.pt --vit best.pth \
        --images ./val_images/ [--imgsz 640]

Without checkpoints it self-checks on random weights + synthetic images
(--selftest), which is what CI exercises.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det", default=None, help="ultralytics .pt")
    ap.add_argument("--vit", default=None, help="Network_Wrapper .pth")
    ap.add_argument("--images", default=None)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--variant", default="s", choices=list("nsmlx"),
                    help="yolov8 size of the .pt checkpoint")
    ap.add_argument("--vit-patch", type=int, default=8, choices=[8, 16],
                    help="ViT patch size of the .pth checkpoint")
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--allow-pickle", action="store_true",
                    help="permit full unpickling (ultralytics .pt pickles; "
                         "trusted sources only)")
    args = ap.parse_args()

    if args.selftest or not (args.det and args.vit and args.images):
        print("running self-test (random weights, synthetic scenes)")
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
        import pytest
        rc = pytest.main(["-q", os.path.join(
            os.path.dirname(__file__), "..", "tests", "test_e2e_parity.py")])
        sys.exit(int(rc))

    import dataclasses
    import shutil
    import tempfile
    import numpy as np
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                                convert_yolov8,
                                                convert_vit_wrapper)
    from yolov8_vit_tpu.runtime.engine import Engine, save_engine
    from yolov8_vit_tpu.serve.infer import main as infer_main, path_to_list
    from yolov8_vit_tpu.utils import enable_compilation_cache
    from PIL import Image

    enable_compilation_cache()
    det_sd = load_torch_state_dict(args.det, allow_pickle=args.allow_pickle)
    vit_sd = load_torch_state_dict(args.vit, allow_pickle=args.allow_pickle)
    det_params = convert_yolov8(det_sd)
    vit_params = convert_vit_wrapper(vit_sd)

    cfg = DetectConfig(variant=args.variant,
                       input_size=(args.imgsz, args.imgsz))
    vit_spec = ViTSpec(patch=args.vit_patch)
    pipe = TwoStagePipeline(det_cfg=cfg, vit_spec=vit_spec,
                            classify_budget=8, dtype=jnp.float32)
    fn = jax.jit(pipe.__call__)
    params = {"det": det_params, "vit": vit_params}

    # host reference path: the same converted weights through serve/infer.py
    # (cv2 letterbox + Engine calls + host NMS — an independent second
    # implementation of the whole flow)
    tmp = tempfile.mkdtemp(prefix="acc_check_")
    det_eng = Engine(save_engine(
        os.path.join(tmp, "det"), "detect", det_params,
        {"detect_cfg": {k: (list(v) if isinstance(v, tuple) else v)
                        for k, v in dataclasses.asdict(cfg).items()}}))
    det_eng.set_desired(["num_dets", "bboxes", "scores", "labels"])
    cls_eng = Engine(save_engine(
        os.path.join(tmp, "cls"), "classify", vit_params,
        {"vit_spec": dataclasses.asdict(vit_spec), "num_classes": 5}))

    paths = path_to_list(args.images)
    host_rows = infer_main(det_eng, paths, model_list=[cls_eng])
    by_name: dict = {}
    for row in host_rows:
        by_name.setdefault(row[0], []).append(row)

    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
        ua = ((a[2] - a[0]) * (a[3] - a[1]) +
              (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-9)

    total = agree = count_match = 0
    ious = []
    for path in paths:
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
        out = jax.tree.map(np.asarray, fn(params, jnp.asarray(img[None])))
        valid = np.nonzero(out["final_valid"][0])[0]
        host = list(by_name.get(os.path.basename(path), []))
        count_match += int(len(valid) == len(host))
        print(f"{os.path.basename(path)}: fused={len(valid)} "
              f"host={len(host)} detections")
        for k in valid:
            fbox = out["boxes"][0][k]
            fcls = int(out["cls_labels"][0][k])
            if fcls < 0:
                fcls = int(out["det_labels"][0][k])
            best_i, best = -1, 0.0
            for i, row in enumerate(host):
                v = iou(fbox, row[3:7])
                if v > best:
                    best_i, best = i, v
            total += 1
            # require a real overlap before pairing: accepting any IoU > 0
            # let a barely-overlapping wrong detection consume the match
            # and count toward class agreement
            if best_i >= 0 and best >= 0.5:
                ious.append(best)
                agree += int(host[best_i][1] == fcls)
                host.pop(best_i)
            print(f"  box={fbox.round(1)} "
                  f"det={int(out['det_labels'][0][k])}"
                  f"@{out['det_scores'][0][k]:.3f} cls={fcls} "
                  f"match_iou={best:.3f}")
    shutil.rmtree(tmp, ignore_errors=True)
    n_img = len(paths)
    print(f"\nimages: {n_img}  detection-count agreement: "
          f"{count_match}/{n_img}")
    if total:
        mean_iou = float(np.mean(ious)) if ious else 0.0
        print(f"detections: {total}  mean matched IoU: {mean_iou:.4f}  "
              f"class agreement: {agree}/{total} "
              f"({100.0 * agree / total:.1f}%)")


if __name__ == "__main__":
    main()
