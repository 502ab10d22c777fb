"""Detect-head densification for synthetic dense-scene runs.

A random-init DFL head emits huge near-identical boxes everywhere (the
softmax expectation lands ~center bin x stride, clamped to the frame), so
the area NMS collapses every image to one box and nothing downstream of
the detector gets exercised.  Biasing the distribution bins low (small
anchor-centered boxes, disjoint across the grid) and sharpening the convs
(score/size diversity) turns a random detector into a genuinely dense
scene generator — used by the dense bench modes, the multichip dryrun's
serving leg, and the overflow-reclassify tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def densify_detect_head(params, reg_max: int = 16):
    """Return `params` with the two-stage tree's detect head re-biased so a
    random-init pipeline produces many small disjoint detections.  Mutates
    (and returns) the passed dict: `params["det"]` is replaced."""
    det = jax.tree.map(np.asarray, params["det"])
    head = det["params"]["detect"]
    low = -2.0 * np.tile(np.arange(reg_max, dtype=np.float32), 4)
    for i in range(3):
        head[f"box{i}_2"]["kernel"] = head[f"box{i}_2"]["kernel"] * 3.0
        head[f"box{i}_2"]["bias"] = low.astype(head[f"box{i}_2"]["bias"].dtype)
        head[f"cls{i}_2"]["kernel"] = head[f"cls{i}_2"]["kernel"] * 40.0
    params["det"] = jax.tree.map(jnp.asarray, det)
    return params
