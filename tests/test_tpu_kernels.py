"""Hardware gate: every production Pallas kernel executes COMPILED on the
real TPU and matches its reference (tests/tpu_kernels_helper.py).

The rest of the suite runs the kernels in interpret mode on the CPU mesh;
Mosaic miscompiles can be hardware-only (a round-1 SDPA packing corrupted
data on the chip while interpret mode was clean — docs/performance.md),
so CI needs at least one compiled-on-chip execution of each kernel family:
fused attention (bf16 + int8), the int8 MLP+LN kernel, and both scan-NMS
kernels.  The detect graph's chip execution is covered separately by
test_pjrt_driver.py::test_driver_executes_end_to_end.
"""
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(AXON_PLUGIN),
                    reason="tunnel PJRT plugin absent")
def test_pallas_kernels_on_hardware():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # let sitecustomize register axon
    # generous timeout: the tunnel handshake alone has been observed at
    # 4-10 min under load, before any of the helper's kernel compiles
    # (same reasoning as the 1800 s driver-e2e budget)
    run = subprocess.run(
        ["python", os.path.join(REPO, "tests", "tpu_kernels_helper.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    assert "KERNELS_MATCH" in run.stdout, (
        f"stdout:\n{run.stdout}\nstderr:\n{run.stderr[-2000:]}")
