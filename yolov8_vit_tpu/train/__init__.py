from yolov8_vit_tpu.train.losses import (  # noqa: F401
    focal_loss, label_smoothing_ce, combined_loss,
)
from yolov8_vit_tpu.train.schedule import cosine_anneal_schedule  # noqa: F401
from yolov8_vit_tpu.train.vit_train import (  # noqa: F401
    ViTTrainer, make_optimizer, make_train_step,
)
from yolov8_vit_tpu.train.yolo_loss import (  # noqa: F401
    yolo_detection_loss, task_aligned_assign, pairwise_ciou,
)
from yolov8_vit_tpu.train.map_eval import evaluate_map  # noqa: F401
from yolov8_vit_tpu.train.ema import EMA  # noqa: F401
