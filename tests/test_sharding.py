"""Mesh sharding: data-parallel + bag-sharded pooling on the 8-device CPU mesh.

Sharded execution must be numerically equivalent to single-device execution
(bag-sharded softmax pooling is exact — SURVEY §2.2 SP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toad_tpu.config import ModelConfig, OptimConfig
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.parallel.mesh import make_mesh, mesh_shape_for
from toad_tpu.parallel.sharding import batch_shardings, replicate, shard_batch
from toad_tpu.train.loop import make_train_step
from toad_tpu.train.optim import make_optimizer


def _batch(b=8, n=256, d=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "features": rng.randn(b, n, d).astype(np.float32),
        "patch_mask": (rng.rand(b, n) < 0.9).astype(np.float32),
        "bag_mask": np.ones(b, np.float32),
        "label": rng.randint(0, 5, b).astype(np.int32),
        "site": rng.randint(0, 2, b).astype(np.int32),
        "sex": rng.randint(0, 2, b).astype(np.int32),
    }


def test_mesh_shape_resolution():
    assert mesh_shape_for(8) == (8, 1)
    assert mesh_shape_for(8, data_shards=4) == (4, 2)
    assert mesh_shape_for(8, bag_shards=2) == (4, 2)
    assert mesh_shape_for(8, 2, 4) == (2, 4)
    with pytest.raises(ValueError):
        mesh_shape_for(8, 3)
    with pytest.raises(ValueError):
        mesh_shape_for(8, 2, 2)


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_forward_sharded_matches_single(shape):
    cfg = ModelConfig(in_dim=32, n_classes=5, size_arg="small")
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = _batch()

    ref = model.apply(
        params,
        jnp.asarray(batch["features"]),
        jnp.asarray(batch["patch_mask"]),
        jnp.asarray(batch["sex"]),
    )

    mesh = make_mesh(*shape)
    params_r = replicate(mesh, params)
    sb = shard_batch(batch, mesh)
    fn = jax.jit(lambda p, f, m, s: model.apply(p, f, m, s).logits)
    logits = fn(params_r, sb["features"], sb["patch_mask"], sb["sex"])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref.logits), rtol=1e-4, atol=1e-5)


def test_train_step_sharded_matches_single():
    """SGD, not Adam: with Adam the first step is ±lr·sign(grad), so a
    ~1e-9 gradient (attention-score bias — softmax grads sum to ~0) flips
    sign under different reduction orders and the comparison is meaningless.
    SGD updates scale with the gradient, so equivalence is testable."""
    cfg = ModelConfig(in_dim=32, n_classes=5, size_arg="small")
    model = ToadMIL(cfg)
    tx = make_optimizer(OptimConfig(name="sgd", lr=1e-3))
    batch = _batch()
    key = jax.random.PRNGKey(7)

    step = make_train_step(model, tx, 0.75, 0.25)
    params0 = model.init(jax.random.PRNGKey(1))
    p_ref, _, m_ref = step(jax.tree.map(jnp.copy, params0), tx.init(params0), key, batch)

    mesh = make_mesh(2, 4)
    params_s = replicate(mesh, jax.tree.map(jnp.copy, params0))
    opt_s = replicate(mesh, tx.init(params0))
    sb = shard_batch(batch, mesh)
    step2 = make_train_step(model, tx, 0.75, 0.25)
    p_sh, _, m_sh = step2(params_s, opt_s, key, sb)

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_shard_batch_divisibility_errors():
    mesh = make_mesh(4, 2)
    batch = _batch(b=6)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(batch, mesh)


def test_batch_shardings_layout():
    mesh = make_mesh(4, 2)
    sh = batch_shardings(mesh)
    assert sh["features"].spec == jax.sharding.PartitionSpec("data", "bag", None)
    assert sh["label"].spec == jax.sharding.PartitionSpec("data")
