from yolov8_vit_tpu.runtime.detector import decode_predictions  # noqa: F401
from yolov8_vit_tpu.runtime.engine import Engine  # noqa: F401
