"""Accuracy parity checker: fused TPU pipeline vs the host reference flow.

Given the ORIGINAL torch checkpoints (ultralytics .pt + Network_Wrapper
.pth) — or already-built ENGINE DIRECTORIES (e.g. the synthetic-trained
lifecycle engines, tests/test_full_lifecycle.py) — converts/loads them
once and runs every image through TWO independent implementations: the
single-graph fused pipeline (models/two_stage.py) and the inferdet-parity
host path (serve/infer.py: cv2 letterbox, engine calls, host NMS), then
reports detection-count agreement, greedy-matched box IoU, and class
agreement (runtime/accuracy.py): the user-level version of
tests/test_e2e_parity.py for real weights.  (Torch-side goldens for the
same flow are pinned in-repo by tests/test_e2e_parity.py.)

    python tools/accuracy_check.py --det best.pt --vit best.pth \
        --images ./val_images/ [--imgsz 640]
    python tools/accuracy_check.py --det det_engine_dir/ \
        --vit cls_engine_dir/ --images ./val_images/

Without checkpoints it self-checks on random weights + synthetic images
(--selftest), which is what CI exercises; the trained-weights CI leg is
tests/test_full_lifecycle.py::test_accuracy_artifact_on_trained_engines.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det", default=None,
                    help="ultralytics .pt OR a detect engine dir")
    ap.add_argument("--vit", default=None,
                    help="Network_Wrapper .pth OR a classify engine dir")
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

    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.runtime.accuracy import compare_fused_vs_host
    from yolov8_vit_tpu.serve.infer import path_to_list
    from yolov8_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    num_classes = 5
    det_spec = None
    if os.path.isdir(args.det):                  # engine dirs
        from yolov8_vit_tpu.runtime.engine import Engine
        det_eng = Engine(args.det)
        cls_eng = Engine(args.vit)
        det_params, vit_params = det_eng.params, cls_eng.params
        cfg, vit_spec = det_eng.det_cfg, cls_eng.vit_spec
        num_classes = cls_eng.num_classes
        det_spec = det_eng.meta.get("det_spec")
    else:                                        # original torch ckpts
        from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                                    convert_yolov8,
                                                    convert_vit_wrapper)
        det_params = convert_yolov8(load_torch_state_dict(
            args.det, allow_pickle=args.allow_pickle))
        vit_params = convert_vit_wrapper(load_torch_state_dict(
            args.vit, allow_pickle=args.allow_pickle))
        cfg = DetectConfig(variant=args.variant,
                           input_size=(args.imgsz, args.imgsz))
        vit_spec = ViTSpec(patch=args.vit_patch)

    paths = path_to_list(args.images)
    m = compare_fused_vs_host(det_params, vit_params, cfg, vit_spec, paths,
                              num_classes=num_classes, det_spec=det_spec,
                              verbose=True)
    print(f"\nimages: {m['images']}  detection-count agreement: "
          f"{m['count_match']}/{m['images']}")
    if m["detections"]:
        print(f"detections: {m['detections']}  mean matched IoU: "
              f"{m['mean_iou']:.4f}  class agreement: "
              f"{m['class_agree']}/{m['detections']} "
              f"({100.0 * m['class_agree'] / m['detections']:.1f}%)")


if __name__ == "__main__":
    main()
