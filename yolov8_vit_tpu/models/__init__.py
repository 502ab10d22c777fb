from yolov8_vit_tpu.models.vit import ViT, ViTClassifier, VIT_B8_224  # noqa: F401
from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS  # noqa: F401


def __getattr__(name):
    # lazy: two_stage pulls in runtime.detector, which imports this package
    if name == "TwoStagePipeline":
        from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
        return TwoStagePipeline
    raise AttributeError(name)
