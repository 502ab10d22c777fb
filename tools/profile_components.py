"""Per-component TPU timing: detector / ViT / NMS / pre-post ops.

Usage: python tools/profile_components.py [--batch 8]
Prints one line per component with ms/step and achieved TFLOPS.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def bench_fn(fn, args, iters=20, warmup=2):
    """Honest timing over the tunnel: enqueue iters, fetch one scalar."""
    from yolov8_vit_tpu.utils.profiling import device_barrier
    for _ in range(warmup):
        out = fn(*args)
    device_barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_barrier(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from yolov8_vit_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
    from yolov8_vit_tpu.runtime.detector import decode_predictions
    from yolov8_vit_tpu.ops import letterbox, crop_and_resize_nearest
    import dataclasses

    b = args.batch
    rng = np.random.default_rng(0)
    report = []

    # --- detector (yolov8s 640, bf16, PRODUCTION config: s2d cell stem
    # fed by the s2d-emitting letterbox) ---
    from yolov8_vit_tpu.ops.letterbox import letterbox_s2d
    from yolov8_vit_tpu.ops import blob as _blob
    cfg = DetectConfig(variant="s")
    spec = dataclasses.replace(YOLOV8_VARIANTS["s"], num_classes=5)
    det = YOLOv8(spec, fused=True, stem_s2d=True, cell_region=True)
    imgs640 = jnp.asarray(rng.integers(0, 256, (b, 640, 640, 3),
                                       dtype=np.uint8))
    cells0 = _blob(letterbox_s2d(imgs640, (640, 640), pad_value=114,
                                 dtype=jnp.bfloat16)[0]).astype(jnp.bfloat16)
    params = jax.jit(det.init)(jax.random.PRNGKey(0), cells0)

    def f(p, im):
        cells = _blob(letterbox_s2d(im, (640, 640), pad_value=114,
                                    dtype=jnp.bfloat16)[0]).astype(jnp.bfloat16)
        return det.apply(p, cells)

    f = jax.jit(f)
    dt = bench_fn(f, (params, imgs640), args.iters)
    report.append(("lb+yolov8s_fwd", dt, 2 * 14.3e9 * b))  # ~28.6 GFLOPs/img

    # --- detector + decode + NMS (scan kernel, the production path) ---
    f2 = jax.jit(lambda p, im: decode_predictions(f.__wrapped__(p, im), cfg))
    dt2 = bench_fn(f2, (params, imgs640), args.iters)
    report.append(("lb+yolov8s_fwd+nms", dt2, 2 * 14.3e9 * b))

    # --- ViT variants (PRODUCTION config: fused int8 attention + int8
    # MLP with fused LN, plus the plain bf16/XLA path for comparison) ---
    for name, vs, gflops in [
        ("vit_b16_int8", ViTSpec(patch=16, quant="w8a", attn_impl="fused"),
         35.2),
        ("vit_b8_int8", ViTSpec(quant="w8a", attn_impl="fused"), 156.0),
        ("vit_b16_bf16_xla", ViTSpec(patch=16), 35.2),
    ]:
        model = ViTClassifier(vs, 5, dtype=jnp.bfloat16)
        xv = jnp.asarray(rng.random((b * 4, 224, 224, 3)), jnp.bfloat16)
        pv = jax.jit(model.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
        fv = jax.jit(model.apply)
        dtv = bench_fn(fv, (pv, xv), args.iters)
        report.append((f"{name}_x{b*4}crops", dtv, gflops * 1e9 * b * 4))

    # --- NMS alone (scan kernel = the production path) ---
    from yolov8_vit_tpu.ops.nms import efficient_nms_scan
    boxes = jnp.asarray(rng.random((b, 8400, 4)) * 640, jnp.float32)
    scores = jnp.asarray(rng.random((b, 8400, 5)) * 0.5, jnp.float32)
    fn_scan = jax.jit(jax.vmap(lambda bb, ss: efficient_nms_scan(bb, ss)))
    dtn = bench_fn(fn_scan, (boxes, scores), args.iters)
    report.append(("nms_scan_8400x5", dtn, 0))

    # --- letterbox + crop ---
    imgs = jnp.asarray(rng.integers(0, 256, (b, 720, 1280, 3), dtype=np.uint8))
    fl = jax.jit(lambda im: letterbox(im, (640, 640))[0])
    dtl = bench_fn(fl, (imgs,), args.iters)
    report.append(("letterbox_720p", dtl, 0))

    bxs = jnp.asarray(rng.integers(0, 300, (b * 4, 4)), jnp.int32)
    bxs = bxs.at[:, 2:].add(300)
    img1 = imgs[0]
    fc = jax.jit(lambda im, bb: crop_and_resize_nearest(im, bb, (224, 224)))
    dtc = bench_fn(fc, (img1, bxs), args.iters)
    report.append((f"crop{b*4}_224", dtc, 0))

    print(f"batch={b} device={jax.devices()[0]}")
    for name, dt, flops in report:
        tflops = flops / dt / 1e12 if flops else 0
        print(f"{name:28s} {dt*1e3:9.2f} ms/step"
              + (f"  {tflops:6.1f} TFLOPS" if flops else ""))


if __name__ == "__main__":
    main()
