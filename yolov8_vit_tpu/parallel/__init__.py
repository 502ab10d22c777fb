from yolov8_vit_tpu.parallel.mesh import make_mesh, local_mesh  # noqa: F401
from yolov8_vit_tpu.parallel.sharding import (  # noqa: F401
    shard_batch, replicate, vit_param_sharding, shard_params,
)
