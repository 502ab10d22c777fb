from yolov8_vit_tpu.runtime.detector import decode_predictions  # noqa: F401
from yolov8_vit_tpu.runtime.engine import Engine, save_engine  # noqa: F401
from yolov8_vit_tpu.runtime.convert import (  # noqa: F401
    convert_vit_wrapper, convert_yolov8, load_torch_state_dict,
)
