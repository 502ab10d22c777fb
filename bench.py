"""Benchmark harness for the five BASELINE.json configs.  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline", "extra": {...}}.

Modes (--mode):
  two_stage  (default, BASELINE config #3) fused detect->NMS->crop->classify
             (YOLOv8-s 640 + ViT-B/16 224) in images/sec/chip vs the
             1,500 img/s/chip north star.  The default operating point is
             the PRODUCTION-DENSITY one: classify budget 2 at batch 32
             (production scenes average 1-2 covers/frame; the reference
             classifies every kept box and so does this path — scenes
             denser than the budget reclassify exactly through the
             BatchRunner overflow ladder, pinned by tests/test_batch_runner
             .py::test_budget2_matches_budget8_and_host_path).  The same
             run also measures and reports the conservative budget-4
             batch-8 line in extra.
  detect     (config #2) YOLOv8-n 640 detect + NMS images/sec/chip
  classify   (config #1) ViT classifier forward images/sec/chip
  train      (config #5) ViT fine-tune step throughput (images/sec)
  serve      (config #4) batched-stream serving path: native JPEG decode ->
             bucketed fused pipeline, end-to-end images/sec incl. host work

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


def _emit(metric, value, unit, vs_baseline, **extra) -> None:
    """vs_baseline=None omits the field (modes with no meaningful baseline
    ratio — emitting 0.0 read like a failed comparison)."""
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(vs_baseline, 4)
    rec["extra"] = extra
    print(json.dumps(rec))


def _timed(fn, args, iters, barrier):
    out = fn(*args)
    barrier(out)
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    barrier(out)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default=os.environ.get("BENCH_MODE", "two_stage"),
                    choices=["two_stage", "detect", "classify", "train",
                             "serve"])
    ap.add_argument("--smoke", action="store_true")
    # batch/budget default per mode (resolved below): two_stage/serve run at
    # the production-density operating point (budget 2, batch 32 — measured
    # sweep docs/performance.md round 4); detect/classify/train keep batch 8
    # for cross-round comparability
    ap.add_argument("--batch", type=int,
                    default=(int(os.environ["BENCH_BATCH"])
                             if "BENCH_BATCH" in os.environ else None))
    # 150 iters keeps the single completion-barrier fetch (~28 ms tunnel
    # RTT, reported as fetch_rtt_ms) under 2% of the timed window; at 50 it
    # inflated step_ms by ~0.55 ms
    ap.add_argument("--iters", type=int, default=int(os.environ.get("BENCH_ITERS", 150)))
    ap.add_argument("--budget", type=int,
                    default=(int(os.environ["BENCH_BUDGET"])
                             if "BENCH_BUDGET" in os.environ else None))
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
    ap.add_argument("--input", choices=["640", "720p"],
                    default=os.environ.get("BENCH_INPUT", "640"),
                    help="camera frame size fed to the pipeline: '720p' "
                         "adds the real 1280x720 -> 640 letterbox resize "
                         "(production path); '640' is pre-sized input")
    ap.add_argument("--dense", action="store_true",
                    default=os.environ.get("BENCH_DENSE", "0") == "1",
                    help="high-cover synthetic scene: thresholds + head "
                         "priors tuned so final_valid saturates nms_topk "
                         "(the classify budget overflows).  two_stage "
                         "shows the static-shape graph is density-"
                         "independent; serve shows the overflow-"
                         "reclassify cost (overflow_ms)")
    args = ap.parse_args()
    if args.budget is None:
        args.budget = 2 if args.mode in ("two_stage", "serve") else 4
    if args.batch is None:
        args.batch = 32 if args.mode in ("two_stage", "serve") else 8

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
    from yolov8_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # completion barrier: on the tunneled axon platform block_until_ready
    # is a no-op, so fetch a tiny scalar reduction of the LAST step's
    # output (the device executes enqueued programs in order)
    from yolov8_vit_tpu.utils.profiling import device_barrier as barrier
    rng = np.random.default_rng(0)
    # every mode jits an UNSHARDED graph (single-device execution), so
    # img/s/chip == measured throughput regardless of visible device count
    # (dividing by device_count under-reported 8x in --smoke's virtual mesh)
    n_chips = 1
    device = str(jax.devices()[0])
    vit_tag = args.vit + ("-int8" if args.quant else "")

    # ---- shared model configs ---------------------------------------------
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.vit import ViTSpec

    if args.smoke:
        det_cfg = DetectConfig(input_size=(64, 64), variant="n",
                               nms_pre_topk=64, nms_topk=16)
        vit_spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                           backbone_classes=40)
        batch, iters = 2, 3
        img_hw = (96, 128)
        dtype = jnp.float32
        # report what actually runs: the smoke branch ignores
        # --vit/--quant/--input, and echoing those args recorded a
        # "b16-int8 @ 640" line for a tiny unquantized harness check
        vit_tag = "tiny-smoke"
    else:
        det_cfg = DetectConfig(
            variant="s" if args.mode in ("two_stage", "serve") else "n")
        # pad_tokens stays 0: lane-padding B/8's 785 tokens to 896 measured
        # SLOWER (29.0 -> 33.7 ms for 32 crops — the +14% padded-row FLOPs
        # with no alignment win left to buy; docs/performance.md round 3)
        vit_spec = ViTSpec(patch=8 if args.vit == "b8" else 16,
                           quant="w8a" if args.quant else "none",
                           attn_impl="fused")
        batch, iters = args.batch, args.iters
        img_hw = (720, 1280) if args.input == "720p" else (640, 640)
        dtype = jnp.bfloat16

    # ---- modes --------------------------------------------------------------
    if args.dense and args.mode in ("two_stage", "serve"):
        import dataclasses as _dc
        det_cfg = _dc.replace(det_cfg, nms_conf=1e-6, conf_second=1e-6,
                              nms_iou=0.995, custom_nms_iou=0.999)

    def _densify_head(params):
        from yolov8_vit_tpu.utils.densify import densify_detect_head
        return densify_detect_head(params, det_cfg.reg_max)

    if args.mode in ("two_stage", "serve"):
        from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
        pipe = TwoStagePipeline(det_cfg=det_cfg, vit_spec=vit_spec,
                                classify_budget=args.budget, dtype=dtype)
        params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
        if args.dense:
            params = _densify_head(params)

        if args.mode == "two_stage":
            if args.dense:
                # dense extreme: densified head, random frames, fused loop
                images = jnp.asarray(rng.integers(
                    0, 256, (batch, *img_hw, 3), dtype=np.uint8))
                fn = pipe.jit()
                dt = _timed(fn, (params, images), iters, barrier)
                v = batch * iters / dt / n_chips
            else:
                # PRODUCTION-DENSITY headline (round-5): content-FITTED
                # head (utils/densify.fit_detect_head — detections track
                # planted covers through the real graph) on calibrated
                # ~1.5-covers/frame scenes, timed through
                # BatchRunner.run_device_batches so result fetch AND the
                # overflow-reclassify ladder are INSIDE the timed region
                # (async result copies stream behind compute; the ladder
                # pipelines cross-batch).  The reference classifies every
                # kept box (/root/reference/YOLOTensorRT_yolodet_py_解读
                # .md:94-117); this measures that semantics at the honest
                # density instead of a zero-detection scene.
                from yolov8_vit_tpu.serve.batch_runner import BatchRunner
                from yolov8_vit_tpu.utils.densify import (
                    fit_detect_head, make_cover_scenes)
                n_fit, n_pool = (4, 2) if args.smoke else (16, 16)
                fit_imgs, fit_covers = make_cover_scenes(
                    rng, n_fit, img_hw, lam=1.5)
                params = fit_detect_head(params, pipe, fit_imgs, fit_covers)
                pools, true_covers = [], 0
                for _ in range(n_pool):
                    imgs_np, covers = make_cover_scenes(
                        rng, batch, img_hw, lam=1.2)
                    true_covers += sum(len(c) for c in covers)
                    pools.append(jnp.asarray(imgs_np))
                runner = BatchRunner(pipe, params, max_batch=batch)
                # warm: fused fn via a full pass, ladder fn explicitly
                # (at honest density most batches don't overflow, and a
                # first-overflow compile must not land mid-timing)
                k_small = batch * args.budget
                barrier(runner._cls_fn(
                    runner.params, pools[0],
                    jnp.zeros((k_small,), jnp.int32),
                    jnp.tile(jnp.asarray([[0, 0, 16, 16]], jnp.int32),
                             (k_small, 1))))
                recs0 = runner.run_device_batches(pools)
                flat0 = [r for recs in recs0 for r in recs]
                mean_valid = float(np.mean(
                    [r["final_valid"].sum() for r in flat0]))

                prof: dict = {}
                seq = [pools[i % n_pool] for i in range(iters)]
                t0 = time.perf_counter()
                runner.run_device_batches(seq, profile=prof)
                dt = time.perf_counter() - t0
                v = batch * iters / dt / n_chips

                # the round-2..4 fused-graph device line, same scenes
                # (enqueued loop + one completion barrier)
                t0 = time.perf_counter()
                for i in range(iters):
                    out = runner._fn(runner.params, pools[i % n_pool])
                barrier(out)
                dt_fused = time.perf_counter() - t0
                fn = lambda p, im: runner._fn(p, im)  # latency probe below
                images = pools[0]

            # per-step latency distribution: one barrier per step.  On the
            # tunneled runtime every blocking fetch pays the relay
            # round-trip, so measure that floor with an empty program and
            # report it alongside (BASELINE metric: p50 per-image latency).
            lat_iters = min(iters, 30) if not args.smoke else 3
            rtts = []
            trivial = jax.jit(lambda: jnp.zeros(()))
            for _ in range(lat_iters):
                t0 = time.perf_counter()
                float(trivial())
                rtts.append((time.perf_counter() - t0) * 1e3)
            lats = []
            for _ in range(lat_iters):
                t0 = time.perf_counter()
                barrier(fn(params, images))
                lats.append((time.perf_counter() - t0) * 1e3)
            lats.sort()
            rtts.sort()
            p50 = lats[len(lats) // 2]
            p95 = lats[min(int(len(lats) * 0.95), len(lats) - 1)]

            extra_density = {}
            if args.dense:
                out = jax.tree.map(np.asarray, pipe(params, images))
                extra_density = {
                    "dense": True,
                    "mean_valid_per_img":
                        round(float(out["final_valid"].sum()) / batch, 1),
                    "overflowed":
                        int(((out["final_valid"])
                             & (out["cls_labels"] < 0)).sum())}
            else:
                extra_density = {
                    "scene": "content-fitted detect head, calibrated "
                             "production density (lam 1.2 planted covers)",
                    "timed_path": "BatchRunner.run_device_batches: result "
                                  "fetch + overflow-reclassify ladder "
                                  "inside the timed region",
                    "mean_valid_per_img": round(mean_valid, 2),
                    "true_covers_per_img":
                        round(true_covers / (n_pool * batch), 2),
                    # PRE-patch ladder traffic in the timed run (the old
                    # post-patch count was 0 by construction — the ladder
                    # had already classified every overflow det)
                    "overflow_dets_timed": prof.get("overflow_dets", 0),
                    "overflow_ms_total": round(prof.get("overflow_ms",
                                                        0.0), 1),
                    "fetch_ms_total": round(prof.get("fetch_ms", 0.0), 1),
                    "fused_loop_img_s":
                        round(batch * iters / dt_fused / n_chips, 1),
                    "fused_loop_step_ms": round(dt_fused / iters * 1e3, 2)}

            extra_conservative = {}
            if args.budget == 2 and not args.smoke and not args.dense:
                # same run also reports the conservative budget-4 line
                # (every image gets 4 classify slots; the round-2/-3
                # headline protocol) at batch 8 (cross-round comparable)
                # and batch 32 (its best operating point)
                pipe4 = TwoStagePipeline(det_cfg=det_cfg, vit_spec=vit_spec,
                                         classify_budget=4, dtype=dtype)
                params4 = jax.jit(pipe4.init_params)(jax.random.PRNGKey(0))
                fn4 = pipe4.jit()
                for b4 in (8, 32):
                    im4 = images[:b4] if b4 <= batch else jnp.asarray(
                        rng.integers(0, 256, (b4, *img_hw, 3),
                                     dtype=np.uint8))
                    dt4 = _timed(fn4, (params4, im4), iters, barrier)
                    extra_conservative[f"budget4_batch{b4}"] = {
                        "img_s": round(b4 * iters / dt4 / n_chips, 1),
                        "step_ms": round(dt4 / iters * 1e3, 2)}
                extra_conservative["overflow_semantics"] = (
                    "budget-2 overflow reclassifies exactly: tests/"
                    "test_batch_runner.py::"
                    "test_budget2_matches_budget8_and_host_path")

            _emit("two_stage_images_per_sec_per_chip", v, "images/s/chip",
                  v / 1500.0, batch=batch, iters=iters,
                  classify_budget=args.budget,
                  step_ms=round(dt / iters * 1e3, 2),
                  input="x".join(map(str, img_hw)),
                  p50_ms=round(p50, 2), p95_ms=round(p95, 2),
                  fetch_rtt_ms=round(rtts[len(rtts) // 2], 2),
                  vit=vit_tag, device=device, smoke=args.smoke,
                  **extra_density, **extra_conservative)
            return

        # serve: host decode (native lib if built) + bucketed device
        # pipeline over a STREAM of files (chunks enqueue before any result
        # fetch, so decode/compute/transfer overlap)
        import shutil
        import tempfile
        import cv2
        from yolov8_vit_tpu.serve.batch_runner import BatchRunner
        tmp = tempfile.mkdtemp(prefix="bench_serve_")
        n_files = batch * max(iters // 5, 1)
        paths = []
        # realistic camera-frame entropy (round-4 VERDICT weak #4): flat
        # single-circle frames compressed to ~8 KB and understated both
        # decode_ms and bytes/frame.  Per-frame Gaussian sensor noise +
        # low-frequency texture + 1-2 covers lands JPEG sizes in the real
        # camera range; the JSON reports the measured bytes/frame so the
        # wire-rate arithmetic stays checkable.
        h_, w_ = img_hw
        yy, xx = np.mgrid[0:h_, 0:w_].astype(np.float32)
        for i in range(n_files):
            base = (90 + 25 * np.sin(xx / (17 + i % 7))
                    * np.cos(yy / (23 + i % 5)))
            img = (base[..., None]
                   + rng.normal(0, 14, (*img_hw, 3))).clip(0, 255) \
                .astype(np.uint8)
            for _ in range(1 + i % 2):
                cv2.circle(img, (int(rng.integers(80, w_ - 80)),
                                 int(rng.integers(80, h_ - 80))),
                           int(rng.integers(35, 70)),
                           tuple(int(v) for v in rng.integers(140, 255, 3)),
                           -1)
            p = os.path.join(tmp, f"f{i}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)
        bytes_per_frame = int(np.mean([os.path.getsize(p)
                                       for p in paths[:64]]))
        runner = BatchRunner(pipe, params, max_batch=batch)
        runner.run_paths(paths[:batch])  # warm compile

        # pure device step at serve shapes (device-resident input): the
        # directly-attached projection — on this rig the stream number is
        # tunnel-upload-bound (tens of MB/s for ~10 MB per 640px batch),
        # which says nothing about the framework's serving capability
        dev_imgs = jnp.asarray(np.stack(
            [np.asarray(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB))
             for p in paths[:batch]]))
        dev_iters = 3 if args.smoke else 30
        barrier(runner._fn(runner.params, dev_imgs))
        t0 = time.perf_counter()
        for _ in range(dev_iters):
            out = runner._fn(runner.params, dev_imgs)
        barrier(out)
        device_step_ms = (time.perf_counter() - t0) / dev_iters * 1e3
        direct_attach_est = batch / device_step_ms * 1e3

        # streamed requests with CROSS-REQUEST pipelining: request N+1
        # decodes + enqueues while N's results are in flight (run_stream)
        prof: dict = {}
        loops = max(iters // 5, 1)
        reqs = [paths[i * batch:(i + 1) * batch] for i in range(loops)]
        n_ok = 0
        t0 = time.perf_counter()
        for res in runner.run_stream(reqs, profile=prof):
            n_ok += sum(r is not None for r in res)
        dt = time.perf_counter() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        assert n_ok == batch * loops, \
            f"serve bench dropped {batch * loops - n_ok} images"
        v = batch * loops / dt / n_chips
        prof = {k: round(val / loops, 2) for k, val in prof.items()}
        _emit("serve_stream_images_per_sec_per_chip", v, "images/s/chip",
              v / 1500.0, batch=batch, loops=loops, vit=vit_tag,
              device=device, smoke=args.smoke, profile_ms=prof,
              pipelined=True, jpeg_bytes_per_frame=bytes_per_frame,
              device_step_ms=round(device_step_ms, 2),
              direct_attach_est_img_s=round(direct_attach_est, 1),
              note="end-to-end incl. host JPEG decode + device upload, "
                   "cross-request pipelined; direct_attach_est = device "
                   "step alone (the non-tunnel serving capability)")
        return

    if args.mode == "detect":
        import dataclasses
        from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
        from yolov8_vit_tpu.runtime.detector import decode_predictions
        from yolov8_vit_tpu.ops import area_sorted_nms
        spec = dataclasses.replace(
            YOLOV8_VARIANTS[det_cfg.variant], num_classes=det_cfg.num_classes)
        model = YOLOv8(spec, fused=True)
        size = det_cfg.input_size
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, *size, 3), dtype))
        x = jnp.asarray(rng.random((batch, *size, 3)), dtype)

        def fwd(p, x):
            num, boxes, scores, labels = decode_predictions(
                model.apply(p, x), det_cfg)
            keep = jax.vmap(lambda b, s, v: area_sorted_nms(
                b, s, v, iou_threshold=det_cfg.custom_nms_iou,
                score_threshold=det_cfg.conf_second))(
                    boxes, scores, labels >= 0)
            return {"num": num, "boxes": boxes, "keep": keep}

        fn = jax.jit(fwd)
        dt = _timed(fn, (params, x), iters, barrier)
        v = batch * iters / dt / n_chips
        _emit("detect_images_per_sec_per_chip", v, "images/s/chip",
              v / 1500.0, batch=batch, variant=det_cfg.variant,
              step_ms=round(dt / iters * 1e3, 2), device=device,
              smoke=args.smoke)
        return

    if args.mode == "classify":
        from yolov8_vit_tpu.models.vit import ViTClassifier
        model = ViTClassifier(vit_spec, 5, dtype=dtype)
        s = vit_spec.img_size
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, s, s, 3), dtype))
        x = jnp.asarray(rng.random((batch, s, s, 3)), dtype)
        from yolov8_vit_tpu.models.vit import vit_compiler_options
        fn = jax.jit(model.apply,
                     compiler_options=vit_compiler_options(vit_spec))
        dt = _timed(fn, (params, x), iters, barrier)
        v = batch * iters / dt / n_chips
        _emit("classify_images_per_sec_per_chip", v, "images/s/chip",
              v / 1500.0, batch=batch, vit=vit_tag,
              step_ms=round(dt / iters * 1e3, 2), device=device,
              smoke=args.smoke)
        return

    if args.mode == "train":
        from yolov8_vit_tpu.config import CFG
        from yolov8_vit_tpu.models.vit import ViTClassifier
        from yolov8_vit_tpu.train import make_optimizer, make_train_step
        cfg = CFG()
        tspec = vit_spec if args.smoke else ViTSpec(
            patch=8 if args.vit == "b8" else 16)   # training stays f32/bf16
        model = ViTClassifier(tspec, cfg.num_classes)
        tx = make_optimizer(cfg)
        s = tspec.img_size
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, s, s, 3)))
        opt_state = tx.init(params)
        step = jax.jit(make_train_step(model, tx))
        imgs = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
        onehot = jnp.asarray(np.eye(cfg.num_classes, dtype=np.float32)[
            rng.integers(0, cfg.num_classes, batch)])

        def fn(params, opt_state):
            p, o, loss, c = step(params, opt_state, imgs, onehot,
                                 jnp.float32(cfg.lr))
            return {"loss": loss, "c": c}

        dt = _timed(fn, (params, opt_state), iters, barrier)
        v = batch * iters / dt / n_chips
        # no reference/baseline protocol exists for train throughput
        # (BASELINE.md's north star is the two-stage pipeline) — omit the
        # ratio rather than emit a dead 0.0
        _emit("vit_train_images_per_sec_per_chip", v, "images/s/chip",
              None, batch=batch, vit=args.vit,
              step_ms=round(dt / iters * 1e3, 2), device=device,
              smoke=args.smoke)
        return


if __name__ == "__main__":
    sys.exit(main())
