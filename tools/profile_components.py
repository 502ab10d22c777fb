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
    reduce_out = jax.jit(
        lambda o: jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x).astype(jnp.float32), o)))
    for _ in range(warmup):
        out = fn(*args)
    float(reduce_out(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(reduce_out(out))
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
    from yolov8_vit_tpu.ops import letterbox, efficient_nms, crop_and_resize_nearest
    import dataclasses

    b = args.batch
    rng = np.random.default_rng(0)
    report = []

    # --- detector (yolov8s 640, bf16) ---
    cfg = DetectConfig(variant="s")
    spec = dataclasses.replace(YOLOV8_VARIANTS["s"], num_classes=5)
    det = YOLOv8(spec, fused=True)
    x = jnp.asarray(rng.random((b, 640, 640, 3)), jnp.bfloat16)
    params = jax.jit(det.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 640, 640, 3), jnp.bfloat16))
    f = jax.jit(lambda p, x: det.apply(p, x))
    dt = bench_fn(f, (params, x), args.iters)
    report.append(("yolov8s_fwd", dt, 2 * 14.3e9 * b))  # ~28.6 GFLOPs/img

    # --- detector + decode + NMS ---
    f2 = jax.jit(lambda p, x: decode_predictions(det.apply(p, x), cfg))
    dt2 = bench_fn(f2, (params, x), args.iters)
    report.append(("yolov8s_fwd+nms", dt2, 2 * 14.3e9 * b))

    # --- ViT variants ---
    for name, vs, gflops in [
        ("vit_b8_224", ViTSpec(), 156.0),
        ("vit_b16_224", ViTSpec(patch=16), 35.2),
    ]:
        model = ViTClassifier(vs, 5, dtype=jnp.bfloat16)
        xv = jnp.asarray(rng.random((b * 4, 224, 224, 3)), jnp.bfloat16)
        pv = jax.jit(model.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
        fv = jax.jit(model.apply)
        dtv = bench_fn(fv, (pv, xv), args.iters)
        report.append((f"{name}_x{b*4}crops", dtv, gflops * 1e9 * b * 4))

    # --- NMS alone ---
    boxes = jnp.asarray(rng.random((b, 8400, 4)) * 640, jnp.float32)
    scores = jnp.asarray(rng.random((b, 8400, 5)) * 0.5, jnp.float32)
    fn_nms = jax.jit(jax.vmap(lambda bb, ss: efficient_nms(bb, ss)))
    dtn = bench_fn(fn_nms, (boxes, scores), args.iters)
    report.append(("efficient_nms_8400", dtn, 0))

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
    report.append(("crop32_224", dtc, 0))

    print(f"batch={b} device={jax.devices()[0]}")
    for name, dt, flops in report:
        tflops = flops / dt / 1e12 if flops else 0
        print(f"{name:28s} {dt*1e3:9.2f} ms/step"
              + (f"  {tflops:6.1f} TFLOPS" if flops else ""))


if __name__ == "__main__":
    main()
