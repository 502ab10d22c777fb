"""C++ PJRT driver: build, CLI behavior, and StableHLO artifact export.

Full execute-on-TPU runs on real TPU hosts (the CI chip sits behind a
tunnel libtpu cannot reach), so these tests cover everything up to the
hardware boundary: the binary builds, loads a plugin, reports the API
version, and fails gracefully without devices; the Python side emits a
loadable MLIR module + serialized compile options.
"""
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "csrc", "build", "mt_infer")
LIBTPU = "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"


def _build():
    subprocess.run(["make", "-C", os.path.join(REPO, "csrc"), "mt_infer"],
                   check=True, capture_output=True)


def test_driver_builds():
    _build()
    assert os.path.exists(DRIVER)


def test_driver_requires_plugin():
    _build()
    out = subprocess.run([DRIVER], capture_output=True, text=True)
    assert out.returncode == 2
    assert "--plugin required" in out.stderr


def test_driver_reports_bad_plugin():
    _build()
    out = subprocess.run([DRIVER, "--plugin", "/nonexistent.so"],
                        capture_output=True, text=True)
    assert out.returncode == 1
    assert "dlopen failed" in out.stderr


@pytest.mark.skipif(not os.path.exists(LIBTPU), reason="libtpu absent")
def test_driver_loads_libtpu_api():
    _build()
    out = subprocess.run([DRIVER, "--plugin", LIBTPU, "--list-devices"],
                        capture_output=True, text=True, timeout=120)
    # api version banner must print even when no local TPU exists
    assert "PJRT api version" in out.stdout


def test_stablehlo_export(tmp_path):
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.runtime.export import export_stablehlo_detect
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOv8Spec
    import dataclasses

    cfg = DetectConfig(input_size=(64, 64), variant="n", nms_pre_topk=64,
                       nms_topk=16)
    spec = YOLOv8Spec(0.33, 0.125, 1024, num_classes=5)
    model = YOLOv8(spec, fused=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    # patch variant table lookup by exporting through the module API
    import yolov8_vit_tpu.runtime.export as ex
    import yolov8_vit_tpu.models.yolov8 as y8
    orig = y8.YOLOV8_VARIANTS["n"]
    y8.YOLOV8_VARIANTS["n"] = dataclasses.replace(spec)
    try:
        ex.export_stablehlo_detect(params, cfg, str(tmp_path / "det"))
    finally:
        y8.YOLOV8_VARIANTS["n"] = orig
    mlir = (tmp_path / "det.mlir").read_text()
    assert "stablehlo" in mlir or "mhlo" in mlir
    assert (tmp_path / "det.opts.pb").stat().st_size > 100
