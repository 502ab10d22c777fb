"""Parity gate for the fused b1+b2 region kernel (ops/fused_region.py).

The kernel is a maintained measurement artifact (it answers the ledger's
hand-kernel question; it does not ship in the model), so the bar here is
the same as for production kernels: interpret-mode equality with the
shipping XLA cell path at reduced dims, over multiple seeds, including
the band-halo edges that sank the e55c prototype.  Full-dim on-chip
parity (max |delta| 0.002 on std 0.056, batch 32) is recorded in
docs/performance.md (e59e/e59f).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov8_vit_tpu.ops.fused_region import (fused_b1b2,
                                             region_b1b2_reference)


def _rand_params(key, c1, c2):
    ks = jax.random.split(key, 10)
    c = c2 // 2

    def conv(kk, kb, shape):
        return {"conv": {
            "kernel": jax.random.normal(kk, shape, jnp.bfloat16) * 0.08,
            "bias": jax.random.normal(kb, (shape[-1],), jnp.float32) * 0.1}}

    return {
        "b1": conv(ks[0], ks[1], (3, 3, c1, c2)),
        "cv1": conv(ks[2], ks[3], (1, 1, c2, c2)),
        "m0_cv1": conv(ks[4], ks[5], (3, 3, c, c)),
        "m0_cv2": conv(ks[6], ks[7], (3, 3, c, c)),
        "cv2": conv(ks[8], ks[9], (1, 1, 3 * c, c2)),
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_region_matches_xla_cell_path(seed):
    key = jax.random.PRNGKey(seed)
    kx, kp = jax.random.split(key)
    h, c1, c2 = 80, 8, 16              # reduced dims, same band structure
    x = jax.random.normal(kx, (2, h, h, 4 * c1), jnp.bfloat16) * 0.3
    params = _rand_params(kp, c1, c2)
    ref = np.asarray(region_b1b2_reference(x, params), np.float32)
    got = np.asarray(fused_b1b2(x, params, interpret=True), np.float32)
    assert got.shape == ref.shape == (2, h // 2, h // 2, 4 * c2)
    # bf16 reassociation class (cellconv.py docstring): ~3 ulp through
    # three stacked bf16 stages; 0.05*std matches the measured full-dim
    # on-chip ratio (0.002/0.056, e59e).  The halo masks make edge rows
    # exact zeros of the same silu outputs, so it holds at band seams.
    d = np.abs(got - ref)
    assert d.max() <= 0.05 * max(ref.std(), 1e-3), (
        f"max delta {d.max():.5f} vs std {ref.std():.4f}")


def test_fused_region_band_seams_not_special():
    """The e55c failure mode: band-boundary rows diverging while the
    interior is exact.  Check the per-band-seam error is no worse than
    the interior error."""
    key = jax.random.PRNGKey(7)
    kx, kp = jax.random.split(key)
    h, c1, c2 = 80, 8, 16
    x = jax.random.normal(kx, (1, h, h, 4 * c1), jnp.bfloat16) * 0.3
    params = _rand_params(kp, c1, c2)
    ref = np.asarray(region_b1b2_reference(x, params), np.float32)
    got = np.asarray(fused_b1b2(x, params, interpret=True), np.float32)
    d = np.abs(got - ref)
    bh = h // 2 // 4
    seam_rows = [r for t in range(1, 4) for r in (t * bh - 1, t * bh)]
    interior = np.delete(d, seam_rows, axis=1)
    assert d[:, seam_rows].max() <= max(interior.max(), 1e-6) * 1.5 + 1e-6
