"""Train-state checkpoint/resume and parameter EMA."""
import numpy as np
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import CFG
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.train.ema import EMA
from yolov8_vit_tpu.train.vit_train import ViTTrainer
from yolov8_vit_tpu.utils.checkpoint import TrainCheckpointer

TINY = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
               backbone_classes=16)


def test_ema_ramp_and_convergence():
    p0 = {"w": jnp.zeros((4,))}
    ema = EMA(p0, decay=0.9, tau=10.0)
    pt = {"w": jnp.ones((4,))}
    ema.update(pt)
    # early updates: decay ramp ~0 -> EMA follows current params closely
    assert float(ema.params["w"][0]) > 0.9
    for _ in range(200):
        ema.update(pt)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 1.0, atol=1e-3)


def _loaders(n=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
    onehot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, n)]

    def loader():
        for i in range(0, n, 4):
            yield imgs[i:i + 4], onehot[i:i + 4]
    return loader


def test_fit_resumes_from_checkpointer(tmp_path):
    cfg = CFG(epoch=3, train_bs=4, lr=1e-3)
    trainer = ViTTrainer(cfg=cfg, spec=TINY, log_fn=lambda *a: None)
    params, opt = trainer.init()

    # run 3 epochs straight through
    p_full, _, best_full = trainer.fit(params, opt, _loaders(), _loaders())

    # same schedule, interrupted after epoch 2, then resumed
    ck = TrainCheckpointer(str(tmp_path / "ck"))
    t2 = ViTTrainer(cfg=cfg, spec=TINY, log_fn=lambda *a: None)
    p2, o2, _ = t2.fit(params, opt, _loaders(), _loaders(), checkpointer=ck,
                       stop_after_epoch=2)
    assert ck.latest_step() == 2

    t3 = ViTTrainer(cfg=cfg, spec=TINY, log_fn=lambda *a: None)
    p3, _, best3 = t3.fit(params, opt, _loaders(), _loaders(),
                          checkpointer=ck)   # resumes at epoch 3
    assert ck.latest_step() == 3
    # resumed run must land on the same weights as the uninterrupted run
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    ck.close()


def test_fit_resume_preserves_result_json(tmp_path):
    """result.json is rewritten wholesale each epoch; a resumed run must
    carry the pre-resume epochs forward instead of truncating the log to
    post-resume epochs (the exact case the checkpointer exists for)."""
    import json
    cfg = CFG(epoch=3, train_bs=4, lr=1e-3)
    log_path = str(tmp_path / "result.json")
    ck = TrainCheckpointer(str(tmp_path / "ck"))
    t = ViTTrainer(cfg=cfg, spec=TINY, log_path=log_path,
                   log_fn=lambda *a: None)
    params, opt = t.init()
    t.fit(params, opt, _loaders(), _loaders(), log=True,
          checkpointer=ck, stop_after_epoch=2)
    assert set(json.load(open(log_path))) == {"1", "2"}
    t2 = ViTTrainer(cfg=cfg, spec=TINY, log_path=log_path,
                    log_fn=lambda *a: None)
    t2.fit(params, opt, _loaders(), _loaders(), log=True, checkpointer=ck)
    assert set(json.load(open(log_path))) == {"1", "2", "3"}
    ck.close()
