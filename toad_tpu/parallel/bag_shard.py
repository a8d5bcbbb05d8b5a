"""Bag-sharded attention pooling: the MIL analog of sequence parallelism.

For 150k+-patch bags (BASELINE.json stretch scale) a single bag's patch
dimension is sharded over the mesh's ``bag`` axis; each device computes
shard-local flash statistics (unnormalized weighted sum + running max +
denominator) with the fused Pallas kernel, and one tiny ``psum`` pair over
ICI combines them exactly — communication is O(B*T*H), independent of N.
Exact because TOAD pooling is a softmax-weighted MEAN (single softmax), not
pairwise attention (SURVEY §2.2 SP row).

The plain XLA path gets the same result implicitly via GSPMD sharding
propagation; this module is the explicit, kernel-compatible version.
"""

from __future__ import annotations

import functools
import inspect
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from toad_tpu.ops.pallas_pool import NEG_INF, T_PAD, pallas_pool_partial, xla_pool_partial


def combine_partial_pool(acc: jax.Array, stats: jax.Array, axis_name: str):
    """Inside shard_map: flash-combine shard-local (acc, stats) into the
    globally exact pooled [B, T_PAD, H]."""
    mx, denom = stats[:, 0, :], stats[:, 1, :]  # [B, T_PAD]
    gmax = jax.lax.pmax(mx, axis_name)
    # fully-masked shards contribute nothing (scale 0), and exp stays finite
    scale = jnp.where(mx <= NEG_INF / 2, 0.0, jnp.exp(mx - jnp.where(gmax <= NEG_INF / 2, 0.0, gmax)))
    acc = jax.lax.psum(acc * scale[:, :, None], axis_name)
    denom = jax.lax.psum(denom * scale, axis_name)
    # 1e-12 not 1e-30: must survive squaring in f32 under autodiff (see
    # ops/pooling.py masked_softmax)
    return acc / jnp.maximum(denom, 1e-12)[:, :, None]


@functools.lru_cache(maxsize=None)
def _sharded_local(mesh: Mesh, axis: str, impl: str, compute_dtype_name: str, interpret: bool):
    """Build (and cache) the shard_map-wrapped local pooling fn — the wrapper
    construction, shard_map signature probe, and closure are invariant per
    (mesh, axis, impl, dtype), so rebuilding them per batch in an inference
    loop was pure per-call Python overhead."""
    compute_dtype = jnp.dtype(compute_dtype_name)

    def local(params, x_l, mask_l):
        if impl == "pallas":
            acc, stats = pallas_pool_partial(
                params, x_l, mask_l, compute_dtype=compute_dtype, interpret=interpret
            )
        else:
            acc, stats = xla_pool_partial(params, x_l, mask_l, compute_dtype=compute_dtype)
        return combine_partial_pool(acc, stats, axis)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    sig = inspect.signature(shard_map)
    check_kw = {"check_vma": False} if "check_vma" in sig.parameters else (
        {"check_rep": False} if "check_rep" in sig.parameters else {}
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=P(),
        **check_kw,
    )


def bag_sharded_pool(
    params: Any,
    x: jax.Array,  # [B, N, D] global
    mask: jax.Array,  # [B, N] global
    mesh: Mesh,
    *,
    axis: str = "bag",
    impl: str = "pallas",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    n_tasks: int | None = None,
):
    """Pooled [B, T, H] with the patch dim sharded over ``mesh[axis]``.

    ``impl='pallas'`` runs the fused kernel per shard; ``impl='xla'`` uses the
    jnp partial (useful on CPU meshes / as oracle). Both are exact.
    ``n_tasks`` defaults to the task count in ``params`` (columns beyond it
    hold T_PAD filler, not real pooled values — never return them).
    """
    if impl == "pallas" and "b" not in params["attn"]:
        impl = "xla"  # the fused kernel implements the gated variant only
    if n_tasks is None:
        n_tasks = int(params["attn"]["c"]["w"].shape[1])
    fn = _sharded_local(mesh, axis, impl, jnp.dtype(compute_dtype).name, bool(interpret))
    pooled = fn(params, x, mask)
    return pooled[:, :n_tasks, :]
