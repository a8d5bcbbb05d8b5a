"""Device mesh construction: ('data', 'bag') axes.

The reference's only scaling mechanism is single-node ``nn.DataParallel``
over the attention trunk (``models/model_toad.py:77-88``). The TPU-native
replacement is a 2-D ``jax.sharding.Mesh``:

- **data** axis: bags (slides) are data-parallel — each shard holds a slice
  of the batch dimension;
- **bag** axis: within a bag, the patch dimension N is sharded — the exact
  analog of sequence parallelism for MIL. It is *exact* because attention
  pooling is one masked softmax-weighted mean over N: under GSPMD, XLA
  lowers the max/sum reductions to ``psum`` over ICI (SURVEY §2.2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, data_shards: int | None = None, bag_shards: int | None = None) -> tuple[int, int]:
    """Resolve a (data, bag) mesh shape for n_devices. Explicit values win;
    otherwise all devices go to the data axis (bags are plentiful)."""
    if data_shards is not None and bag_shards is not None:
        if data_shards * bag_shards != n_devices:
            raise ValueError(f"data_shards*bag_shards = {data_shards*bag_shards} != n_devices = {n_devices}")
        return (data_shards, bag_shards)
    if data_shards is not None:
        if n_devices % data_shards:
            raise ValueError(f"{n_devices} devices not divisible by data_shards={data_shards}")
        return (data_shards, n_devices // data_shards)
    if bag_shards is not None:
        if n_devices % bag_shards:
            raise ValueError(f"{n_devices} devices not divisible by bag_shards={bag_shards}")
        return (n_devices // bag_shards, bag_shards)
    return (n_devices, 1)


def make_mesh(data_shards: int | None = None, bag_shards: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = mesh_shape_for(len(devices), data_shards, bag_shards)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=("data", "bag"))
