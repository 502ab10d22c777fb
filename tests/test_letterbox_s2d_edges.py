"""letterbox_s2d edge geometries: extreme aspect ratios, tiny inputs."""
import numpy as np
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu.ops.letterbox import letterbox, letterbox_s2d


@pytest.mark.parametrize("in_hw", [(1000, 250), (30, 200), (64, 64),
                                   (17, 23)])
def test_s2d_equals_zero_ring_canvas(in_hw):
    rng = np.random.default_rng(sum(in_hw))
    img = jnp.asarray(rng.integers(0, 256, (1, *in_hw, 3), dtype=np.uint8))
    cells, r, dwdh = letterbox_s2d(img, (64, 64), dtype=jnp.float32)
    ref, r2, dwdh2 = letterbox(img.astype(jnp.float32), (64, 64))
    assert r == r2 and dwdh == dwdh2
    padded = np.pad(np.asarray(ref), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref_cells = padded.reshape(1, 33, 2, 33, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(1, 33, 33, 12)
    np.testing.assert_allclose(np.asarray(cells), ref_cells,
                               rtol=1e-4, atol=1e-3)

