from yolov8_vit_tpu.serve.downloads import download_images  # noqa: F401
from yolov8_vit_tpu.serve.oss import AliyunOss, LocalObjectStore, make_object_store  # noqa: F401
from yolov8_vit_tpu.serve.geocode import location2lalo  # noqa: F401
from yolov8_vit_tpu.serve.sse import LogHub, log  # noqa: F401
