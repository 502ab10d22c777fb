"""Engine build CLI — `export-det.py` + `build.py` parity.

The reference exports PyTorch -> ONNX (with the TRT_NMS symbolic) and then
builds a TensorRT engine (`/root/reference/test.ipynb` cell 0):

    python export-det.py --weights best.pt --iou-thres 0.65 --conf-thres 0.25 \
        --topk 100 --opset 11 --sim --input-shape 1 3 640 640 --device cuda:0
    python build.py --weights best.onnx --fp16

Here one step converts a torch checkpoint (ultralytics .pt for detect,
Network_Wrapper .pth for classify) into an engine directory, baking the
same NMS protocol into meta.json; absent a checkpoint, --random initializes
(benchmarks).  AOT compilation happens lazily per input shape and persists
in the XLA compile cache (the engine-build analogue).

    python -m yolov8_vit_tpu.runtime.export detect --weights best.pt \
        --out weights/detect_engine --iou-thres 0.65 --conf-thres 0.25 --topk 100
    python -m yolov8_vit_tpu.runtime.export classify --weights best.pth \
        --out weights/class_engine --model vit_base_patch8_224.augreg_in21k
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def export_detect(args) -> str:
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.yolov8 import YOLOv8
    from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                                convert_yolov8)
    from yolov8_vit_tpu.runtime.engine import save_engine

    cfg = DetectConfig(
        variant=args.variant, num_classes=args.num_classes,
        input_size=(args.imgsz, args.imgsz), nms_iou=args.iou_thres,
        nms_conf=args.conf_thres, nms_topk=args.topk)
    if args.weights:
        params = convert_yolov8(load_torch_state_dict(
            args.weights, allow_pickle=args.allow_pickle))
    else:
        from yolov8_vit_tpu.models.yolov8 import detect_spec
        model = YOLOv8(detect_spec(cfg), fused=True)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.imgsz, args.imgsz, 3)))
    meta = {"detect_cfg": {
        "variant": cfg.variant, "num_classes": cfg.num_classes,
        "input_size": list(cfg.input_size), "nms_iou": cfg.nms_iou,
        "nms_conf": cfg.nms_conf, "nms_topk": cfg.nms_topk}}
    path = save_engine(args.out, "detect", params, meta,
                       param_dtype=args.param_dtype)
    print(f"detect engine written to {path}")
    if args.stablehlo:
        export_stablehlo_detect(params, cfg, args.stablehlo)
    if args.aot:
        _attach_aot_blobs(path, [(b, args.imgsz, args.imgsz, 3)
                                 for b in args.aot], args.aot_dtype,
                          args.aot_platform)
    if args.compiled:
        _attach_compiled_blobs(path, [(b, args.imgsz, args.imgsz, 3)
                                      for b in args.compiled], args.aot_dtype)
    return path


def _attach_aot_blobs(path, shapes, dtype_names, platform=None) -> None:
    """Attach AOT blobs for every requested activation dtype.  Production
    serving loads engines at bf16 while debugging/parity runs use f32; a
    blob only matches an Engine opened at the dtype it was traced with
    (engine.py::_parse_aot_name), so exporting for both keeps the
    deserialize-instead-of-retrace cold start in either configuration.
    platform: cross-lower for another backend (e.g. 'tpu' from a CPU CI
    box — the blob then loads trace-free on the serving chip)."""
    import jax.numpy as jnp
    from yolov8_vit_tpu.runtime.engine import attach_aot
    for dn in dtype_names:
        for p in attach_aot(path, shapes, dtype=jnp.dtype(dn),
                            platform=platform):
            print(f"aot executable -> {p}")


def _attach_compiled_blobs(path, shapes, dtype_names) -> None:
    """Attach fully-compiled .jaxcomp binaries (zero-compile load — the
    true deserializeCudaEngine analogue).  Chip/toolchain-specific: run on
    the serving device, like building a TRT plan on the target GPU."""
    import jax.numpy as jnp
    from yolov8_vit_tpu.runtime.engine import attach_compiled
    for dn in dtype_names:
        for p in attach_compiled(path, shapes, dtype=jnp.dtype(dn)):
            print(f"compiled executable -> {p}")


def _write_stablehlo(fn, in_specs, out_prefix: str,
                     platforms=("tpu",), matmul_precision=None,
                     compiler_options=None) -> None:
    """matmul_precision: None keeps the platform default (fast TPU f32 via
    bf16 passes); "highest" forces true-f32 accumulation — used by the
    cross-platform parity test so CPU and TPU agree to ~1e-6.
    compiler_options: xla flag dict baked into the .opts.pb the native
    driver hands to PJRT_Client_Compile (e.g. the scoped-VMEM raise every
    fused-attention spec needs, models/vit.py::vit_compiler_options).

    Pallas kernels bake interpret-vs-Mosaic at TRACE time, so tracing runs
    under `lowering_target(<target>)`: a CPU build box exporting a "tpu"
    module emits real Mosaic kernels, not the HLO-emulated interpreter
    loops the local backend would have chosen (ops/lowering.py)."""
    import contextlib
    import jax
    from jaxlib import xla_client

    from yolov8_vit_tpu.ops.lowering import lowering_target

    target = "tpu" if "tpu" in platforms else platforms[0]
    ctx = (jax.default_matmul_precision(matmul_precision)
           if matmul_precision else contextlib.nullcontext())
    with ctx, lowering_target(target):
        exp = jax.export.export(jax.jit(fn),
                                platforms=list(platforms))(*in_specs)
    with open(out_prefix + ".mlir", "w") as f:
        f.write(exp.mlir_module())
    copts = xla_client.CompileOptions()
    if compiler_options:
        copts.env_option_overrides = list(compiler_options.items())
    with open(out_prefix + ".opts.pb", "wb") as f:
        f.write(copts.SerializeAsString())
    print(f"stablehlo module -> {out_prefix}.mlir / {out_prefix}.opts.pb")


def export_stablehlo_detect(params, cfg, out_prefix: str,
                            platforms=("tpu",),
                            matmul_precision=None, det_overrides=None) -> None:
    """Emit <prefix>.mlir + <prefix>.opts.pb for the C++ PJRT driver
    (csrc/pjrt_driver.cc).  The exported graph takes an NHWC float blob in
    [0,1] and returns (num_dets, bboxes, scores, labels) with weights baked
    in as constants — the full 'engine' in one artifact, like the
    reference's serialized TensorRT plan.  Lowered for TPU regardless of
    the exporting process's platform (cross-platform jax.export; Pallas
    kernels lower for the target via ops/lowering.py).  det_overrides:
    explicit YOLOv8Spec fields (engine meta "det_spec") for custom
    scales."""
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, detect_spec
    from yolov8_vit_tpu.runtime.detector import decode_predictions

    model = YOLOv8(detect_spec(cfg, det_overrides), fused=True)

    def forward(x):
        return decode_predictions(model.apply(params, x), cfg)

    h, w = cfg.input_size
    _write_stablehlo(forward,
                     [jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)],
                     out_prefix, platforms, matmul_precision)


def export_stablehlo_classify(params, spec, num_classes: int,
                              out_prefix: str, batch: int = 1,
                              platforms=("tpu",)) -> None:
    """Classifier engine for the native driver: NHWC float crop in [-1, 1]
    (the reference's mean/std .5 normalization, `/root/reference/app.py:39-42`)
    -> (num_classes,) logits."""
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.vit import ViTClassifier, vit_compiler_options

    model = ViTClassifier(spec, num_classes)

    def forward(x):
        return model.apply(params, x)

    s = spec.img_size
    target = "tpu" if "tpu" in platforms else platforms[0]
    _write_stablehlo(forward,
                     [jax.ShapeDtypeStruct((batch, s, s, 3), jnp.float32)],
                     out_prefix, platforms,
                     compiler_options=vit_compiler_options(spec, target))


def export_stablehlo_two_stage(pipe, params, out_prefix: str,
                               batch: int = 1, image_hw=(640, 640),
                               platforms=("tpu",)) -> None:
    """The FULL fused two-stage graph (letterbox -> detect -> NMS -> crop ->
    classify) as one artifact: uint8 RGB images in, the 7-field detection
    dict out (flattened to a tuple in field order).  This is the native
    analogue of the reference's complete decode->infer loop
    (`/root/reference/docs/YOLO_TensorRT_Technical.md:232-286`)."""
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.vit import vit_compiler_options

    keys = ("num_dets", "boxes", "det_scores", "det_labels", "final_valid",
            "cls_labels", "cls_scores")

    def forward(images):
        out = pipe(params, images)
        return tuple(out[k] for k in keys)

    h, w = image_hw
    target = "tpu" if "tpu" in platforms else platforms[0]
    _write_stablehlo(forward,
                     [jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)],
                     out_prefix, platforms,
                     compiler_options=vit_compiler_options(pipe.vit_spec,
                                                           target))


def export_classify(args) -> str:
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                                convert_vit_wrapper)
    from yolov8_vit_tpu.runtime.engine import save_engine

    # full architecture from the timm model id (size/patch/depth/dims) —
    # a patch-substring check silently built ViT-B for large/small models
    from yolov8_vit_tpu.refapi import spec_from_timm_name
    spec = spec_from_timm_name(args.model)
    if args.weights:
        params = convert_vit_wrapper(
            load_torch_state_dict(args.weights,
                                  allow_pickle=args.allow_pickle),
            depth=spec.depth)
    else:
        model = ViTClassifier(spec, args.num_classes)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, spec.img_size, spec.img_size, 3)))
    if args.quant:
        from yolov8_vit_tpu.ops.quant import (prequantize_tree,
                                              MLP_AND_ATTN_SUFFIXES)
        level = "w8a" if args.quant == "w8a" else "w8"
        suffixes = MLP_AND_ATTN_SUFFIXES if level == "w8a" else None
        params = (prequantize_tree(params, suffixes) if suffixes
                  else prequantize_tree(params))
        spec = dataclasses.replace(
            spec, quant=level,
            attn_impl="fused" if level == "w8a" else spec.attn_impl)
    meta = {"vit_spec": dataclasses.asdict(spec),
            "num_classes": args.num_classes, "model_name": args.model}
    path = save_engine(args.out, "classify", params, meta,
                       param_dtype=args.param_dtype)
    print(f"classify engine written to {path}")
    if args.stablehlo:
        export_stablehlo_classify(params, spec, args.num_classes,
                                  args.stablehlo)
    if args.aot:
        _attach_aot_blobs(path, [(b, spec.img_size, spec.img_size, 3)
                                 for b in args.aot], args.aot_dtype,
                          args.aot_platform)
    if args.compiled:
        _attach_compiled_blobs(path, [(b, spec.img_size, spec.img_size, 3)
                                      for b in args.compiled],
                               args.aot_dtype)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(prog="yolov8_vit_tpu.runtime.export")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="build a detect engine")
    d.add_argument("--weights", default=None,
                   help="ultralytics .pt checkpoint (omit for random init)")
    d.add_argument("--out", required=True)
    d.add_argument("--variant", default="s", choices=list("nsmlx"))
    d.add_argument("--num-classes", type=int, default=5)
    d.add_argument("--imgsz", type=int, default=640)
    d.add_argument("--iou-thres", type=float, default=0.65)
    d.add_argument("--conf-thres", type=float, default=0.25)
    d.add_argument("--topk", type=int, default=100)
    d.add_argument("--stablehlo", default=None, metavar="PREFIX",
                   help="also emit PREFIX.mlir + PREFIX.opts.pb for the "
                        "C++ PJRT driver (csrc/build/mt_infer)")
    d.set_defaults(fn=export_detect)

    c = sub.add_parser("classify", help="build a classify engine")
    c.add_argument("--weights", default=None,
                   help="Network_Wrapper .pth checkpoint")
    c.add_argument("--out", required=True)
    c.add_argument("--model", default="vit_base_patch8_224.augreg_in21k")
    c.add_argument("--num-classes", type=int, default=5)
    c.add_argument("--quant", nargs="?", const="w8", default=None,
                   choices=["w8", "w8a"],
                   help="pre-quantize dense weights to int8: 'w8' = MLP "
                        "only, 'w8a' = MLP + attention projections (the "
                        "fast serving config; fused attention kernel)")
    c.add_argument("--stablehlo", default=None, metavar="PREFIX",
                   help="also emit PREFIX.mlir + PREFIX.opts.pb for the "
                        "C++ PJRT driver")
    c.set_defaults(fn=export_classify)

    t = sub.add_parser("two-stage",
                       help="merge detect + classify engines into one "
                            "deployable fused-pipeline artifact")
    t.add_argument("--detect-engine", required=True)
    t.add_argument("--classify-engine", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--budget", type=int, default=4,
                   help="classify slots per image (batch-averaged)")

    def export_two_stage(args):
        from yolov8_vit_tpu.runtime.engine import merge_two_stage_engine
        path = merge_two_stage_engine(args.out, args.detect_engine,
                                      args.classify_engine, args.budget,
                                      param_dtype=args.param_dtype)
        print(f"two-stage engine written to {path}")
        if args.aot or args.compiled:
            import json as _json
            with open(os.path.join(path, "meta.json")) as f:
                h, w = _json.load(f)["detect_cfg"].get("input_size",
                                                       [640, 640])
            if args.aot:
                _attach_aot_blobs(path, [(b, h, w, 3) for b in args.aot],
                                  args.aot_dtype, args.aot_platform)
            if args.compiled:
                _attach_compiled_blobs(path, [(b, h, w, 3)
                                              for b in args.compiled],
                                       args.aot_dtype)
        return path

    t.set_defaults(fn=export_two_stage)

    for p in (d, c, t):
        p.add_argument("--aot", type=int, nargs="*", default=None,
                       metavar="BATCH",
                       help="serialize AOT executables for these batch "
                            "sizes into <out>/aot/ (deserializeCudaEngine "
                            "parity — Engine loads them without re-tracing"
                            "; platform-specific, built for the current "
                            "jax backend)")
        p.add_argument("--compiled", type=int, nargs="*", default=None,
                       metavar="BATCH",
                       help="serialize fully-COMPILED executables "
                            "(.jaxcomp) for these batch sizes — zero-"
                            "compile load, the true deserializeCudaEngine "
                            "analogue.  Chip/toolchain-specific: run this "
                            "on the serving device")
        p.add_argument("--aot-platform", default=None,
                       choices=["tpu", "cpu"],
                       help="cross-lower the .jaxexp AOT blobs for this "
                            "backend instead of the current one (e.g. "
                            "'tpu' from a CPU build box — the blob loads "
                            "trace-free on the serving chip; .jaxcomp "
                            "still requires the target device)")
        p.add_argument("--aot-dtype", nargs="*",
                       default=["bfloat16", "float32"],
                       choices=["bfloat16", "float32"],
                       help="activation dtype(s) to bake into the AOT "
                            "blobs; a blob only matches an Engine opened "
                            "at its dtype, so the default covers both the "
                            "bf16 serving config and f32 parity runs")
        p.add_argument("--param-dtype", default=None,
                       choices=["bfloat16", "float16"],
                       help="store floating param leaves at this dtype "
                            "(halves f32 artifact/wire bytes — the fp16-"
                            "planfile analogue; int8 kernels of --quant "
                            "engines are already at their byte floor). "
                            "Lossy: opt-in, like the reference's fp16 "
                            "engine build")
        p.add_argument("--allow-pickle", action="store_true",
                       help="permit full unpickling of the checkpoint "
                            "(required for ultralytics .pt module pickles; "
                            "executes code from the file — trusted sources "
                            "only)")

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
