"""Torch-golden test of the ultralytics-parity YOLO optimizer.

Pins `make_yolo_optimizer` numerically against torch.optim.SGD with the
exact ultralytics `build_optimizer` group construction + trainer warmup
(`/root/reference/utils/trainYolo.py:33` delegates to `model.train()`,
whose optimizer is: three param groups — biases / BN-and-norm scales /
conv-linear weights — decay only on weights, bias LR warming DOWN from
warmup_bias_lr, other groups up from 0, momentum warming 0.8 -> 0.937,
nesterov SGD, per-epoch stairstep decay factor)."""
from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolov8_vit_tpu.train.yolo_train import (  # noqa: E402
    make_yolo_optimizer, param_group_label)

torch = pytest.importorskip("torch")

LR0, LRF = 1e-2, 0.1
EPOCHS, SPE, NW = 3, 4, 5          # 12 steps total, warmup ends mid-epoch-2
WD, MOM, WMOM, WBLR = 5e-4, 0.937, 0.8, 0.1


def _tiny_tree(rng):
    """Flax-shaped param tree with all three group kinds."""
    f = lambda *s: rng.normal(size=s).astype(np.float32)
    return {
        "b0": {"conv": {"kernel": f(3, 3, 3, 8), "bias": f(8)}},
        "b1": {"conv": {"kernel": f(1, 1, 8, 8), "bias": f(8)},
               "bn": {"scale": f(8), "bias": f(8)}},
        "head": {"dense": {"kernel": f(8, 5), "bias": f(5)}},
    }


def _flatten(tree, prefix=()):
    # sorted keys: matches jax's dict flattening order, so the zip with
    # tree_structure leaves below lines up
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_group_partition():
    tree = _tiny_tree(np.random.default_rng(0))
    labels = {p: param_group_label(p, l) for p, l in _flatten(tree)}
    assert labels[("b0", "conv", "kernel")] == "weight"
    assert labels[("b0", "conv", "bias")] == "bias"
    assert labels[("b1", "bn", "scale")] == "norm"
    assert labels[("b1", "bn", "bias")] == "bias"
    assert labels[("head", "dense", "kernel")] == "weight"
    assert labels[("head", "dense", "bias")] == "bias"


def test_matches_torch_sgd_through_warmup():
    rng = np.random.default_rng(1)
    tree = _tiny_tree(rng)
    flat = list(_flatten(tree))
    # fixed per-step synthetic gradients (deterministic, shared); every
    # third step is large enough to trigger the trainer's global-norm clip
    # at 10 (ultralytics clips before every optimizer step — the loss's
    # `* batch_size` scale depends on it)
    n_steps = EPOCHS * SPE
    grads_per_step = [
        {p: rng.normal(size=l.shape).astype(np.float32)
            * (40.0 if i % 3 == 0 else 0.1)
         for p, l in flat} for i in range(n_steps)]

    # ---- torch side: ultralytics build_optimizer + trainer warmup --------
    tparams = {p: torch.nn.Parameter(torch.tensor(l)) for p, l in flat}
    groups = {"bias": [], "norm": [], "weight": []}
    for p, l in flat:
        groups[param_group_label(p, l)].append(tparams[p])
    # group order matches ultralytics: SGD(bias), then add weight, then norm
    opt = torch.optim.SGD(groups["bias"], lr=LR0, momentum=MOM,
                          nesterov=True)
    opt.add_param_group({"params": groups["weight"], "weight_decay": WD})
    opt.add_param_group({"params": groups["norm"]})

    def lf(epoch):
        return (1.0 - epoch / EPOCHS) * (1.0 - LRF) + LRF

    for ni in range(n_steps):
        epoch = ni // SPE
        for j, g in enumerate(opt.param_groups):
            g["lr"] = float(np.interp(
                ni, [0, NW], [WBLR if j == 0 else 0.0, LR0 * lf(epoch)]))
            g["momentum"] = float(np.interp(ni, [0, NW], [WMOM, MOM]))
        opt.zero_grad()
        for p, _ in flat:
            tparams[p].grad = torch.tensor(grads_per_step[ni][p])
        torch.nn.utils.clip_grad_norm_([tparams[p] for p, _ in flat], 10.0)
        opt.step()

    # ---- jax side --------------------------------------------------------
    jparams = jax.tree.map(jnp.asarray, tree)
    tx = make_yolo_optimizer(LR0, LRF, EPOCHS, SPE, NW,
                             weight_decay=WD, momentum=MOM,
                             warmup_momentum=WMOM, warmup_bias_lr=WBLR)
    state = tx.init(jparams)
    import optax
    for ni in range(n_steps):
        g = grads_per_step[ni]
        gtree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(jparams),
            [jnp.asarray(g[p]) for p, _ in flat])
        upd, state = tx.update(gtree, state, jparams)
        jparams = optax.apply_updates(jparams, upd)

    for p, _ in flat:
        got = np.asarray(jparams[p[0]][p[1]][p[2]])
        want = tparams[p].detach().numpy()
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=str(p))
