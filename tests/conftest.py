"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding code must run in CI without TPUs (SURVEY.md §4 plan (c)):
set the platform + host-device-count flags BEFORE jax initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# determinstic, quiet
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# persistent XLA compile cache: CPU compiles are ~seconds per op here, so
# every jitted graph must compile at most once across the whole suite
from yolov8_vit_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# The environment's sitecustomize may pre-register the tunneled TPU plugin
# and set jax_platforms="axon,cpu" via jax.config (which overrides the env
# var).  Tests must run on the virtual 8-device CPU mesh — force it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
