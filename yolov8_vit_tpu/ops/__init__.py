from yolov8_vit_tpu.ops.resize import resize_nearest, resize_bilinear  # noqa: F401
from yolov8_vit_tpu.ops.letterbox import letterbox, letterbox_params  # noqa: F401
from yolov8_vit_tpu.ops.boxes import (  # noqa: F401
    box_iou, inflate_boxes, unletterbox_boxes, box_area,
)
from yolov8_vit_tpu.ops.nms import efficient_nms, area_sorted_nms  # noqa: F401
from yolov8_vit_tpu.ops.dfl import dfl_decode, make_anchors  # noqa: F401
from yolov8_vit_tpu.ops.crop import crop_and_resize_nearest  # noqa: F401
from yolov8_vit_tpu.ops.preprocess import blob, normalize_pm1  # noqa: F401
