"""Exponential moving average of parameters (ultralytics ModelEMA parity).

ultralytics maintains an EMA of detector weights during training and
validates/exports the EMA copy; `model.train()` does this implicitly
(`/root/reference/utils/trainYolo.py:33` delegates to it).  Same ramped
decay schedule: d(t) = decay * (1 - exp(-t / tau)).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


class EMA:
    def __init__(self, params: Any, decay: float = 0.9999,
                 tau: float = 2000.0):
        self.decay = decay
        self.tau = tau
        self.updates = 0
        self.params = jax.tree.map(jnp.asarray, params)
        # ONE jitted dispatch per step: an eager tree.map enqueues 2 ops per
        # leaf — hundreds of ~1 ms tunnel dispatches per train step on the
        # axon rig, dominating the jitted step it follows.  d is a traced
        # scalar so the ramp doesn't recompile.
        self._apply = jax.jit(lambda ema, p, d: jax.tree.map(
            lambda e, q: e * d + q.astype(e.dtype) * (1.0 - d), ema, p))

    def _d(self) -> float:
        return self.decay * (1.0 - math.exp(-self.updates / self.tau))

    def update(self, params: Any) -> None:
        self.updates += 1
        self.params = self._apply(self.params, params,
                                  jnp.float32(self._d()))
