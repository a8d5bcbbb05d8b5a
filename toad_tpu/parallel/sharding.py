"""Sharding layouts for batches and params over the ('data', 'bag') mesh.

Params are replicated (the model is ~1.2M params — replication is free and
keeps every matmul local); batches shard bag-dim over 'data' and patch-dim
over 'bag'. Under ``jax.jit`` GSPMD propagates these layouts through the
whole step and inserts the ICI collectives for the pooling reduction — no
hand-written communication (SURVEY §5 "distributed backend" row).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_shardings(mesh: Mesh) -> dict[str, NamedSharding]:
    return {
        "features": NamedSharding(mesh, P("data", "bag", None)),
        "patch_mask": NamedSharding(mesh, P("data", "bag")),
        "bag_mask": NamedSharding(mesh, P("data")),
        "label": NamedSharding(mesh, P("data")),
        "site": NamedSharding(mesh, P("data")),
        "sex": NamedSharding(mesh, P("data")),
    }


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Mapping[str, Any], mesh: Mesh) -> dict[str, jax.Array]:
    """Device-put a host batch with the mesh layouts. Requires B % data and
    N % bag divisibility (every default bucket rung divides by bag axes up
    to 256; see config.DEFAULT_BUCKETS)."""
    shardings = batch_shardings(mesh)
    b, n = batch["features"].shape[:2]
    data_n, bag_n = mesh.shape["data"], mesh.shape["bag"]
    if b % data_n:
        raise ValueError(f"batch size {b} not divisible by data axis {data_n}")
    if n % bag_n:
        raise ValueError(f"bucket size {n} not divisible by bag axis {bag_n}")
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
