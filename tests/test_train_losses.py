"""Loss/schedule/optimizer parity vs torch reference implementations."""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.train import (focal_loss, label_smoothing_ce,
                                  combined_loss, cosine_anneal_schedule)


def _torch_focal(inputs, targets, alpha=1, gamma=2):
    bce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = torch.exp(-bce)
    return torch.mean(alpha * (1 - p_t) ** gamma * bce)


def _torch_smooth(x, targets, smoothing=0.1):
    _, target = torch.max(targets, 1)
    y_hat = torch.softmax(x, dim=1)
    cross = -torch.log(y_hat[range(len(y_hat)), target])
    smooth = -torch.log(y_hat).mean(dim=1)
    return ((1 - smoothing) * cross + smoothing * smooth).mean()


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32) * 2
    labels = rng.integers(0, 5, 8)
    onehot = np.eye(5, dtype=np.float32)[labels]
    return logits, onehot


def test_focal_matches_torch(batch):
    logits, onehot = batch
    ref = _torch_focal(torch.from_numpy(logits), torch.from_numpy(onehot))
    ours = focal_loss(jnp.asarray(logits), jnp.asarray(onehot))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_smooth_matches_torch(batch):
    logits, onehot = batch
    ref = _torch_smooth(torch.from_numpy(logits), torch.from_numpy(onehot))
    ours = label_smoothing_ce(jnp.asarray(logits), jnp.asarray(onehot))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_combined_weighting(batch):
    logits, onehot = batch
    f = float(focal_loss(jnp.asarray(logits), jnp.asarray(onehot)))
    s = float(label_smoothing_ce(jnp.asarray(logits), jnp.asarray(onehot)))
    c = float(combined_loss(jnp.asarray(logits), jnp.asarray(onehot)))
    np.testing.assert_allclose(c, s / 6 + 5 * f / 6, rtol=1e-6)


def test_cosine_schedule_parity():
    """vs /root/reference/utils/trainClass.py:97-105."""
    for t in range(10):
        ref = 1e-4 / 2 * (math.cos(math.pi * (t % 10) / 10) + 1)
        assert abs(cosine_anneal_schedule(t, 10, 1e-4) - ref) < 1e-12
    assert cosine_anneal_schedule(0, 10, 1e-4) == pytest.approx(1e-4)


def test_sgd_step_matches_torch():
    """One linear-model train step: optax chain vs torch.optim.SGD."""
    from yolov8_vit_tpu.train import make_optimizer
    from yolov8_vit_tpu.config import CFG

    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(5, 5)).astype(np.float32)
    x = rng.normal(size=(8, 5)).astype(np.float32)
    onehot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)]
    lr = 1e-2

    # torch: two steps to exercise momentum buffer
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=lr, momentum=0.9, weight_decay=1e-3)
    for _ in range(2):
        opt.zero_grad()
        loss = _torch_smooth(torch.from_numpy(x) @ tw,
                             torch.from_numpy(onehot)) / 6 + \
            _torch_focal(torch.from_numpy(x) @ tw,
                         torch.from_numpy(onehot)) * 5 / 6
        loss.backward()
        opt.step()

    # ours
    cfg = CFG(lr=lr)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return combined_loss(jnp.asarray(x) @ p["w"], jnp.asarray(onehot))
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return params, state

    for _ in range(2):
        params, state = step(params, state)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-3, atol=1e-5)
