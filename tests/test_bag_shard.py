"""Bag-sharded pooling (SP analog): shard-local flash stats + psum combine
must equal the single-device pooled output exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from toad_tpu.config import ModelConfig
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.ops.fused_pool import fused_trunk_attention_pool
from toad_tpu.ops.pallas_pool import pallas_pool_partial, xla_pool_partial
from toad_tpu.parallel.bag_shard import bag_sharded_pool, combine_partial_pool


def _mesh(n=4, axis="bag"):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (axis,))


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(in_dim=64, n_classes=5)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b, n = 2, 512
    x = rng.randn(b, n, 64).astype(np.float32)
    mask = (rng.rand(b, n) < 0.8).astype(np.float32)
    return params, jnp.asarray(x), jnp.asarray(mask)


def test_xla_partial_combine_matches_single_device(setup):
    params, x, mask = setup
    ref, _ = fused_trunk_attention_pool(params, x, mask, impl="xla")
    mesh = _mesh(4)
    pooled = bag_sharded_pool(params, x, mask, mesh, impl="xla", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_interpret_partial_matches_xla_partial(setup):
    """Kernel partial mode (interpret) == jnp partial, shard-locally."""
    params, x, mask = setup
    acc_p, stats_p = pallas_pool_partial(params, x, mask, compute_dtype=jnp.float32, interpret=True)
    acc_x, stats_x = xla_pool_partial(params, x, mask, compute_dtype=jnp.float32)
    # max (stats[:,0]) matches exactly on real tasks; denom/acc to fp tolerance
    np.testing.assert_allclose(np.asarray(stats_p[:, 0, :2]), np.asarray(stats_x[:, 0, :2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats_p[:, 1, :2]), np.asarray(stats_x[:, 1, :2]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_p[:, :2]), np.asarray(acc_x[:, :2]), rtol=1e-4, atol=1e-4)


def test_fully_masked_shard_is_exact(setup):
    """A shard whose patches are ALL padding must contribute nothing."""
    params, x, mask = setup
    mask = np.asarray(mask).copy()
    mask[:, 384:] = 0.0  # the 4th of 4 shards is pure padding
    mask = jnp.asarray(mask)
    ref, _ = fused_trunk_attention_pool(params, x, mask, impl="xla")
    pooled = bag_sharded_pool(params, x, mask, _mesh(4), impl="xla", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_combine_is_shard_count_invariant(setup):
    params, x, mask = setup
    p2 = bag_sharded_pool(params, x, mask, _mesh(2), impl="xla", compute_dtype=jnp.float32)
    p8 = bag_sharded_pool(params, x, mask, _mesh(8), impl="xla", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p8), rtol=1e-5, atol=1e-6)


def test_combine_math_directly():
    """combine_partial_pool over manually split halves == whole-bag stats."""
    rng = np.random.RandomState(1)
    cfg = ModelConfig(in_dim=32, n_classes=4)
    params = ToadMIL(cfg).init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(3, 256, 32).astype(np.float32))
    mask = jnp.asarray((rng.rand(3, 256) < 0.7).astype(np.float32))

    ref, _ = fused_trunk_attention_pool(params, x, mask, impl="xla")

    halves = [(x[:, :128], mask[:, :128]), (x[:, 128:], mask[:, 128:])]
    partials = [xla_pool_partial(params, xh, mh, compute_dtype=jnp.float32) for xh, mh in halves]

    def body(accs, statss):
        def f(acc, stats):
            return combine_partial_pool(acc, stats, "s")

        return jax.vmap(f, in_axes=0, out_axes=0, axis_name="s")(accs, statss)

    accs = jnp.stack([p[0] for p in partials])
    statss = jnp.stack([p[1] for p in partials])
    combined = body(accs, statss)[0][:, :2, :]
    np.testing.assert_allclose(np.asarray(combined), np.asarray(ref), rtol=1e-5, atol=1e-6)
