"""Subprocess helper for test_pjrt_driver.py::test_driver_executes_end_to_end.

Runs OUTSIDE the CPU-pinned pytest process, on the axon (TPU) platform:
  1. exports the detect engine to StableHLO (+ jax.export serialization),
  2. invokes csrc/build/mt_infer on a synthetic image against the tunnel
     PJRT plugin (the same chip jax uses),
  3. executes the IDENTICAL serialized module via jax.export.deserialize
     on the driver's dumped input blob,
  4. compares all four engine outputs bit-exactly and prints E2E_MATCH.

Usage: python tests/native_e2e_helper.py <workdir> <plugin.so> <driver>
"""
import dataclasses
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(workdir: str, plugin: str, driver: str) -> int:
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
    from yolov8_vit_tpu.runtime.detector import decode_predictions

    size = 256
    # nms_iou ~1: suppression comparisons never sit near the threshold, so
    # the kept set is robust to ulp-level differences between the two
    # compiled binaries (driver-side vs jax-side compile of the same
    # StableHLO).  Greedy-suppression ORDER semantics are pinned exactly by
    # the same-platform torch-parity tests (tests/test_nms_scan.py); this
    # test gates the native execute path end-to-end.
    cfg = DetectConfig(variant="n", num_classes=5, input_size=(size, size),
                       nms_conf=1e-4, nms_iou=0.9999)
    spec = dataclasses.replace(YOLOV8_VARIANTS["n"], num_classes=5)
    model = YOLOv8(spec, fused=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, size, size, 3)))

    # Random-init activations decay through depth, leaving every class
    # logit within ~1e-6 of its prior — near-exact score TIES whose NMS
    # ordering then flips on ulp-level differences between the two compile
    # paths (driver vs jax).  Self-calibrate: scale the cls output kernels
    # so logits spread by ~3 sigma and the ordering is noise-proof.
    from yolov8_vit_tpu.models.yolov8 import flatten_head_outputs
    probe = jax.jit(lambda p, x: flatten_head_outputs(model.apply(p, x)))
    rng0 = np.random.default_rng(7)
    x0 = jnp.asarray(rng0.random((1, size, size, 3)), jnp.float32)
    x1 = jnp.asarray(rng0.random((1, size, size, 3)), jnp.float32)
    _, l0 = probe(params, x0)
    _, l1 = probe(params, x1)
    # input-dependent spread only (the per-stride priors dominate raw std)
    std = float((np.asarray(l0) - np.asarray(l1)).std())
    scale = 1.5 / max(std, 1e-12)   # sigma~1.5: separated but unsaturated
    p = jax.tree.map(np.asarray, params)
    for i in range(3):
        p["params"]["detect"][f"cls{i}_2"]["kernel"] = \
            p["params"]["detect"][f"cls{i}_2"]["kernel"] * scale
    params = jax.tree.map(jnp.asarray, p)

    def forward(x):
        return decode_predictions(model.apply(params, x), cfg)

    with jax.default_matmul_precision("highest"):
        exp = jax.export.export(jax.jit(forward), platforms=["tpu"])(
            jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32))
    prefix = os.path.join(workdir, "detect")
    with open(prefix + ".mlir", "w") as f:
        f.write(exp.mlir_module())
    from jaxlib import xla_client
    with open(prefix + ".opts.pb", "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())
    blob_ser = exp.serialize()

    # synthetic image (PNG keeps decode lossless on both sides)
    import cv2
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (192, 256, 3), dtype=np.uint8)
    png = os.path.join(workdir, "scene.png")
    cv2.imwrite(png, img)

    env = dict(os.environ)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    env.setdefault("AXON_LOOPBACK_RELAY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    dump = os.path.join(workdir, "drv")
    pjrtexec = os.path.join(workdir, "detect.pjrtexec")
    run = subprocess.run(
        [driver, "--plugin", plugin, "--axon", "--module", prefix + ".mlir",
         "--compile-options", prefix + ".opts.pb", "--image", png,
         "--imgsz", str(size), "--dump-prefix", dump,
         "--save-exec", pjrtexec],
        capture_output=True, text=True, timeout=900, env=env)
    sys.stderr.write(run.stdout + run.stderr)
    if run.returncode != 0:
        print("DRIVER_FAILED")
        return 1

    # save/load roundtrip (trtexec --saveEngine/--loadEngine parity): a
    # SECOND driver process deserializes the compiled binary — no MLIR
    # parse, no XLA compile — and must reproduce the first run bit-exactly
    # (same binary, same chip).
    dump2 = os.path.join(workdir, "drv2")
    run2 = subprocess.run(
        [driver, "--plugin", plugin, "--axon", "--load-exec", pjrtexec,
         "--image", png, "--imgsz", str(size), "--dump-prefix", dump2],
        capture_output=True, text=True, timeout=900, env=env)
    sys.stderr.write(run2.stdout + run2.stderr)
    if run2.returncode != 0 or "deserialized" not in run2.stdout:
        print("LOAD_EXEC_FAILED")
        return 1
    for o in range(4):
        a = open(f"{dump}_{o}.bin", "rb").read()
        b = open(f"{dump2}_{o}.bin", "rb").read()
        if a != b:
            print(f"SAVELOAD_MISMATCH output {o}")
            return 1
    print(f"SAVELOAD_MATCH bytes={os.path.getsize(pjrtexec)}")

    x = np.fromfile(dump + "_input.bin", np.float32).reshape(1, size, size, 3)
    rt = jax.export.deserialize(blob_ser)
    num, boxes, scores, labels = [np.asarray(o) for o in
                                  rt.call(jnp.asarray(x))]

    g_num = np.fromfile(dump + "_0.bin", np.int32)
    g_boxes = np.fromfile(dump + "_1.bin", np.float32).reshape(
        cfg.nms_topk, 4)
    g_scores = np.fromfile(dump + "_2.bin", np.float32)
    g_labels = np.fromfile(dump + "_3.bin", np.int32)

    # The driver's engine is compiled by the terminal-side PJRT compile,
    # jax's by its own path: same StableHLO, two binaries, so bit-identity
    # is not guaranteed — assert tight numeric agreement + exact kept set.
    ok = True
    if int(num[0]) != int(g_num[0]):
        print(f"NUM_MISMATCH {int(num[0])} {int(g_num[0])}")
        ok = False
    if not np.allclose(boxes[0], g_boxes, atol=1e-2):
        bad = np.where(np.abs(boxes[0] - g_boxes).max(-1) > 1e-2)[0]
        print(f"BOX_MISMATCH max={np.abs(boxes[0] - g_boxes).max()} "
              f"ranks={bad[:6].tolist()}")
        for r in bad[:4]:
            print(f"  r{r} s_py={scores[0][r]:.6f} s_drv={g_scores[r]:.6f} "
                  f"py={boxes[0][r].tolist()} drv={g_boxes[r].tolist()}")
        ok = False
    if not np.allclose(scores[0], g_scores, atol=1e-5):
        print(f"SCORE_MISMATCH max={np.abs(scores[0] - g_scores).max()}")
        ok = False
    if not np.array_equal(labels[0], g_labels):
        print("LABEL_MISMATCH")
        ok = False
    if ok:
        print(f"E2E_MATCH num_dets={int(num[0])} "
              f"nonzero_scores={int((g_scores > 0).sum())}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
