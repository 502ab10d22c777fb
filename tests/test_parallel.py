"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY.md §4 (c))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu.parallel import (make_mesh, shard_batch, replicate,
                                     vit_param_sharding)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_spreads_rows():
    mesh = make_mesh(n_data=8)
    x = shard_batch(mesh, jnp.arange(16.0).reshape(16, 1))
    assert len(x.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(x)[:, 0], np.arange(16.0))


def test_vit_tp_sharding_rules():
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)
    model = ViTClassifier(spec, 5)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh(n_data=4, n_model=2)
    sh = vit_param_sharding(mesh, params)
    blk = sh["params"]["model"]["block0"]
    assert blk["attn"]["qkv"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert blk["attn"]["proj"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert blk["mlp_fc1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    # non-TP params replicated
    assert sh["params"]["model"]["pos_embed"].spec == jax.sharding.PartitionSpec()

    # placement actually works and preserves values
    placed = jax.tree.map(jax.device_put, params, sh)
    np.testing.assert_allclose(
        np.asarray(placed["params"]["model"]["block0"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["params"]["model"]["block0"]["attn"]["qkv"]["kernel"]))


def test_dryrun_multichip_8():
    """The driver-facing dry run must execute on 8 virtual devices."""
    import importlib.util, os
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dp_training_step_matches_single_device():
    """Gradient math must be invariant to data sharding."""
    from yolov8_vit_tpu.config import CFG
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    from yolov8_vit_tpu.train import make_optimizer, make_train_step

    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)
    cfg = CFG()
    model = ViTClassifier(spec, 5)
    tx = make_optimizer(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 32, 32, 3)))
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    onehot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)]
    step = jax.jit(make_train_step(model, tx))

    # single device
    p1, _, loss1, c1 = step(params, opt_state, jnp.asarray(imgs),
                            jnp.asarray(onehot), jnp.float32(1e-4))

    # sharded over 8 devices
    mesh = make_mesh(n_data=8)
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, opt_state)
    p2, _, loss2, c2 = step(params_r, opt_r, shard_batch(mesh, jnp.asarray(imgs)),
                            shard_batch(mesh, jnp.asarray(onehot)),
                            jnp.float32(1e-4))
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    l1 = jax.tree.leaves(p1)
    l2 = jax.tree.leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_eval_handles_partial_tail_batch():
    """valid loaders yield a non-divisible tail batch (no drop_last);
    mesh-mode eval must not crash on the 8-way data axis (regression:
    the data-sharded jit required batch % 8 == 0)."""
    import numpy as np
    from yolov8_vit_tpu.config import CFG
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.train.vit_train import ViTTrainer

    mesh = make_mesh(n_data=8)
    spec = ViTSpec(img_size=16, patch=8, dim=32, depth=1, heads=2,
                   backbone_classes=8)
    tr = ViTTrainer(cfg=CFG(train_bs=8, epoch=1), spec=spec, mesh=mesh)
    params, opt_state = tr.init()
    rng = np.random.default_rng(0)

    def loader(sizes):
        for b in sizes:
            yield (rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
                   np.eye(5, dtype=np.float32)[rng.integers(0, 5, b)])

    acc, loss, conf = tr.valid_one_epoch(params, loader([8, 5]))
    assert conf.sum() == 13 and np.isfinite(loss)
    # train path with a tail batch (robustness for drop_last=False loaders)
    params, opt_state, loss, acc = tr.train_one_epoch(
        params, opt_state, loader([8, 3]), epoch0=0)
    assert np.isfinite(loss)


def test_mesh_rejects_bad_factorizations():
    """Silent failure modes become errors: a non-dividing n_model used to
    drop the remainder chips with no warning, and n_model > n built a
    0-device mesh that failed confusingly at the first pjit."""
    with pytest.raises(ValueError):
        make_mesh(n_model=3)            # 3 does not divide 8
    with pytest.raises(ValueError):
        make_mesh(n_model=16)           # exceeds the 8 virtual devices
    with pytest.raises(ValueError):
        make_mesh(n_data=5, n_model=2)  # 10 > 8
    assert make_mesh(n_data=3, n_model=2).devices.shape == (3, 2)  # subset ok


def test_mesh_from_config():
    from yolov8_vit_tpu.config import MeshConfig
    from yolov8_vit_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(MeshConfig(model_parallel=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    custom = mesh_from_config(MeshConfig(data_axis="dp", model_axis="tp"))
    assert custom.axis_names == ("dp", "tp")
    assert custom.devices.shape == (8, 1)
