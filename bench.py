"""End-to-end two-stage throughput benchmark.

Measures the fused detect->NMS->crop->classify pipeline (YOLOv8-s 640px +
ViT-B/8 224px, the reference configuration) in images/sec/chip against the
north-star target of 1,500 img/s/chip (BASELINE.md).  Prints ONE JSON line.

Usage:
    python bench.py              # real device (TPU), full-size models
    python bench.py --smoke      # CPU, tiny models (harness validation)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", 8)))
    ap.add_argument("--iters", type=int, default=int(os.environ.get("BENCH_ITERS", 50)))
    ap.add_argument("--budget", type=int, default=int(os.environ.get("BENCH_BUDGET", 4)))
    ap.add_argument("--vit", choices=["b8", "b16"],
                    default=os.environ.get("BENCH_VIT", "b16"),
                    help="classifier patch size; BASELINE.json's two-stage "
                         "config names ViT-B/16 (the reference code runs "
                         "B/8 — pass --vit b8 for that protocol)")
    ap.add_argument("--quant", action=argparse.BooleanOptionalAction,
                    default=os.environ.get("BENCH_QUANT", "1") == "1",
                    help="fused int8 W8A8 ViT MLP (default on; argmax-"
                         "stable vs f32 in tests, ~1e-2 logit error — the "
                         "int8 analogue of the reference's fp16 engine)")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    if args.smoke:
        # sitecustomize may have pinned jax_platforms to the tunneled TPU;
        # config beats env, so force CPU here too
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.smoke:
        det_cfg = DetectConfig(input_size=(64, 64), variant="n",
                               nms_pre_topk=64, nms_topk=16)
        vit_spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                           backbone_classes=40)
        batch, iters = 2, 3
        img_hw = (96, 128)
    else:
        det_cfg = DetectConfig(variant="s")
        vit_spec = ViTSpec(patch=8 if args.vit == "b8" else 16,
                           quant="w8" if args.quant else "none")
        batch, iters = args.batch, args.iters
        img_hw = (640, 640)

    dtype = jnp.bfloat16 if not args.smoke else jnp.float32
    pipe = TwoStagePipeline(det_cfg=det_cfg, vit_spec=vit_spec,
                            classify_budget=args.budget, dtype=dtype)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, *img_hw, 3),
                                      dtype=np.uint8))
    fn = jax.jit(pipe.__call__)
    # completion barrier: on the tunneled axon platform block_until_ready is
    # unreliable, so force a tiny scalar fetch — the device executes enqueued
    # programs in order, so materializing a reduction of the LAST step's
    # output waits for the whole loop with a 4-byte transfer.
    barrier = jax.jit(lambda o: (jnp.sum(o["boxes"]) +
                                 jnp.sum(o["cls_scores"])).astype(jnp.float32))

    # warmup / compile
    out = fn(params, images)
    float(barrier(out))
    out = fn(params, images)
    float(barrier(out))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, images)
    float(barrier(out))
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    img_per_sec_per_chip = batch * iters / dt / n_chips
    p50_latency_ms = dt / iters * 1000.0  # per-batch step latency

    result = {
        "metric": "two_stage_images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(img_per_sec_per_chip / 1500.0, 4),
        "extra": {
            "batch": batch,
            "iters": iters,
            "classify_budget": args.budget,
            "step_ms": round(p50_latency_ms, 2),
            "vit": args.vit + ("-int8" if args.quant else ""),
            "device": str(jax.devices()[0]),
            "smoke": args.smoke,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
