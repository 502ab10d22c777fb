from yolov8_vit_tpu.utils.cache import enable_compilation_cache  # noqa: F401
