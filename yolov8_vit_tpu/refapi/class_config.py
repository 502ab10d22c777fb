"""Reference `utils/class_config.py` surface
(`/root/reference/utils/class_config.py`): the CFG hyper-parameter class
plus the VOC->YOLO conversion helpers."""
from __future__ import annotations

from yolov8_vit_tpu.config import CFG  # noqa: F401
from yolov8_vit_tpu.data.voc import (convert_box_cxcywh as convert,  # noqa: F401
                                     xml2txt, scan_xml_dirs)  # noqa: F401
