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
