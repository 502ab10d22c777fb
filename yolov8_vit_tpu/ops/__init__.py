from yolov8_vit_tpu.ops.resize import (  # noqa: F401
    resize_nearest, resize_bilinear, resize_bilinear_mm, interp_matrix,
)
from yolov8_vit_tpu.ops.letterbox import (  # noqa: F401
    letterbox, letterbox_params, letterbox_fast, letterbox_s2d,
)
from yolov8_vit_tpu.ops.boxes import (  # noqa: F401
    box_iou, inflate_boxes, unletterbox_boxes, box_area,
)
from yolov8_vit_tpu.ops.nms import (  # noqa: F401
    efficient_nms_scan, area_sorted_nms,
)
from yolov8_vit_tpu.ops.dfl import dfl_decode, make_anchors  # noqa: F401
from yolov8_vit_tpu.ops.crop import crop_and_resize_nearest  # noqa: F401
from yolov8_vit_tpu.ops.preprocess import blob, normalize_pm1  # noqa: F401
from yolov8_vit_tpu.ops.attention import (  # noqa: F401
    flash_attention, fused_attention_block,
)
from yolov8_vit_tpu.ops.quant import (  # noqa: F401
    quantize_weight, quantize_act, quant_dense, quant_dense_pre,
    quant_dense_fused, quant_mlp_fused, quant_mlp_ln_fused, prequantize_tree,
)
