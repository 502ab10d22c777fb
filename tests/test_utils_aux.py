"""Aux subsystems: profiling timer, checkpoint/resume round-trip."""
import numpy as np
import jax.numpy as jnp

from yolov8_vit_tpu.utils.profiling import StepTimer, device_barrier
from yolov8_vit_tpu.utils.checkpoint import TrainCheckpointer


def test_step_timer_percentiles():
    t = StepTimer()
    for v in [0.01, 0.02, 0.03]:
        t.record("step", v)
    s = t.summary()["step"]
    assert s["count"] == 3
    assert abs(s["p50_ms"] - 20.0) < 1e-6


def test_device_barrier_returns_scalar():
    out = device_barrier({"a": jnp.ones((4,)), "b": jnp.full((2, 2), 2.0)})
    assert out == 4.0 + 8.0


def test_checkpoint_roundtrip(tmp_path):
    ck = TrainCheckpointer(str(tmp_path / "ckpt"))
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    opt = {"mu": np.zeros((2, 3), np.float32)}
    ck.save(1, params, opt, extra={"best": 0.5})
    ck.save(2, {"w": params["w"] * 2}, opt, extra={"best": 0.7})
    assert ck.latest_step() == 2
    state = ck.restore()
    np.testing.assert_allclose(state["params"]["w"], params["w"] * 2)
    assert state["extra"]["best"] == 0.7
    # restore an older step
    state1 = ck.restore(1)
    np.testing.assert_allclose(state1["params"]["w"], params["w"])
    ck.close()
