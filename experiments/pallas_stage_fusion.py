"""EXPERIMENT (measured, ruled out): fused ResNet bottleneck *stage* Pallas
kernel — one image per grid step, every intermediate in VMEM.

RESULT on the v5e (B=128, bf16, /tmp/fused_stage_tpu.py harness):
layer1 fused 6.32 ms vs XLA 5.74; layer2 fused 14.87 ms vs XLA 6.32.
The per-tap shifted-slice matmuls pay more in Mosaic relayouts (each tap's
slice must be re-laid-out before the MXU) than the avoided HBM round-trips
are worth, and the full XLA encoder already sustains 82.5 TFLOP/s counted
(~72% of this chip's 115 TFLOP/s measured-achievable matmul ceiling).
Correctness was fully verified (bit-identical to the XLA path on CPU,
3.1e-2 bf16 drift on chip), so this is a performance no, not a correctness
no. Kept under experiments/ as the record; NOT wired into the encoder.

Why: the truncated ResNet-50 encoder's early stages are HBM-bound, not
MXU-bound — measured on the v5e (experiments/encoder_stages.py): layer1
39 TFLOP/s, layer2 55, vs ~91-125 achievable for same-shape convs. XLA
materializes every conv output to HBM (~1 GB per 128-image batch per
bottleneck block); fusing a whole stage per image reads the stage input
once and writes the stage output once.

Design (TPU-first, no translation — the reference runs these convs through
cuDNN, ``models/resnet_custom.py:19-49``):
- grid = (B,): each step processes ONE image; no cross-image halo exchange
  — spatial padding is per-image and lives entirely in VMEM.
- 1x1 convs are plain matmuls over flattened spatial rows.
- the 3x3 conv is 9 per-tap shifted-slice matmuls accumulated in f32
  (im2col's lane-dim concat is not lowerable by Mosaic; per-tap [H*W, C] @
  [C, Cout] is, and the taps pipeline back-to-back on the MXU). Stride 2
  subsamples via reshape + static index (strided slices lower to
  unsupported gathers).
- bf16 matmul inputs, f32 accumulation via preferred_element_type, biases
  f32 — numerics identical to the XLA path (verified bit-identical on CPU,
  within bf16 reduction-order noise on chip).

The kernel is inference-only (the encoder is frozen ImageNet weights, like
the reference's ``resnet_custom.py:111-119``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict[str, Any]


def _subsample2(x, stride: int):
    """[H, W, C] -> [H/s, W/s, C] taking every s-th row/col via reshape +
    static index (Mosaic rejects strided slices / >2D gathers)."""
    if stride == 1:
        return x
    h, w, c = x.shape
    return x.reshape(h // stride, stride, w // stride, stride, c)[:, 0, :, 0, :]


def _conv3x3(x, w2_taps, stride: int, dt):
    """3x3 same-pad conv as 9 per-tap [Ho*Wo, C] @ [C, Cout] matmul
    accumulations — Mosaic-friendly: no lane-dim concatenation (im2col's
    [.., 9C] concat is unsupported: shifted slices carry mismatched vector
    offsets). f32 accumulator. ``w2_taps``: [9, C, Cout], (dy, dx) row-major.
    """
    h, w, c = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    ho, wo = h // stride, w // stride
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(xp, (dy, dx, 0), (dy + h, dx + w, c))
            sl = _subsample2(sl, stride).reshape(ho * wo, c)
            a = jnp.dot(sl.astype(dt), w2_taps[3 * dy + dx], preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
    return acc


def _block_compute(x2d, h, w, blk, stride, dt):
    """One bottleneck block on flattened [H*W, Cin] rows; returns
    ([Ho*Wo, Cout], Ho, Wo). Weights pre-reshaped by `_stage_weights`."""
    ho, wo = h // stride, w // stride
    h1 = jnp.maximum(
        jnp.dot(x2d.astype(dt), blk["w1"], preferred_element_type=jnp.float32) + blk["b1"], 0.0
    ).astype(dt)
    width = h1.shape[-1]
    h2 = jnp.maximum(_conv3x3(h1.reshape(h, w, width), blk["w2"], stride, dt) + blk["b2"], 0.0).astype(dt)
    h3 = jnp.dot(h2, blk["w3"], preferred_element_type=jnp.float32) + blk["b3"]
    if "wd" in blk:
        # downsample skip: 1x1 stride-s conv = spatial subsample + matmul
        xs = _subsample2(x2d.reshape(h, w, x2d.shape[-1]), stride).reshape(ho * wo, -1)
        skip = jnp.dot(xs.astype(dt), blk["wd"], preferred_element_type=jnp.float32) + blk["bd"]
    else:
        skip = x2d.astype(jnp.float32)
    return jnp.maximum(h3 + skip, 0.0).astype(dt), ho, wo


def _make_stage_kernel(h: int, w: int, blocks_meta, dt):
    """blocks_meta: list of (has_downsample, stride) per block."""

    def kernel(x_ref, *refs):
        n_blk = len(blocks_meta)
        out_ref = refs[-1]
        flat = refs[:-1]
        # re-pack flat refs into per-block dicts (6 or 8 refs per block)
        blks = []
        i = 0
        for has_d, _ in blocks_meta:
            names = ["w1", "b1", "w2", "b2", "w3", "b3"] + (["wd", "bd"] if has_d else [])
            blks.append({n: flat[i + j][:] for j, n in enumerate(names)})
            i += len(names)

        x = x_ref[0]  # [H, W, Cin]
        cur = x.reshape(h * w, x.shape[-1])
        ch, cw = h, w
        for blk, (_, stride) in zip(blks, blocks_meta):
            cur, ch, cw = _block_compute(cur, ch, cw, blk, stride, dt)
        out_ref[0] = cur.reshape(ch, cw, cur.shape[-1])

    return kernel


def _stage_weights(stage_params, dt):
    """Folded-BN stage params -> flat tuple of kernel operands.

    conv2 [3,3,C,Cout] HWIO reshapes to [9C, Cout] matching `_im2col3x3`'s
    (dy, dx) tap order; 1x1 convs squeeze to [Cin, Cout].
    """
    flat = []
    meta = []
    for blk in stage_params:
        has_d = "downsample" in blk
        flat.append(jnp.asarray(blk["conv1"])[0, 0].astype(dt))
        flat.append(jnp.asarray(blk["bias1"], jnp.float32))
        w2 = jnp.asarray(blk["conv2"])  # [3,3,C,Co]
        flat.append(w2.reshape(9, w2.shape[2], w2.shape[3]).astype(dt))
        flat.append(jnp.asarray(blk["bias2"], jnp.float32))
        flat.append(jnp.asarray(blk["conv3"])[0, 0].astype(dt))
        flat.append(jnp.asarray(blk["bias3"], jnp.float32))
        if has_d:
            flat.append(jnp.asarray(blk["downsample"]["conv"])[0, 0].astype(dt))
            flat.append(jnp.asarray(blk["downsample"]["bias"], jnp.float32))
        meta.append(has_d)
    return tuple(flat), meta


@functools.partial(
    jax.jit,
    static_argnames=("meta_key", "first_stride", "compute_dtype", "interpret", "vmem_mb"),
)
def _stage_call(x, flat, meta_key, first_stride, compute_dtype=jnp.bfloat16,
                interpret=False, vmem_mb=100):
    b, h, w, cin = x.shape
    dt = jnp.dtype(compute_dtype)
    # meta_key is a static tuple of has_downsample flags
    blocks_meta = [(has_d, first_stride if i == 0 else 1) for i, has_d in enumerate(meta_key)]
    ho, wo = h // first_stride, w // first_stride
    cout = flat[4].shape[1]  # conv3 out of first block

    kernel = _make_stage_kernel(h, w, blocks_meta, dt)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        ],
        out_specs=pl.BlockSpec((1, ho, wo, cout), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x.astype(dt), *flat)


def fused_stage(stage_params, x, *, first_stride: int = 1,
                compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Run one folded-BN bottleneck stage fused (one image per grid step).

    ``stage_params``: the list under ``params['layerN']`` AFTER
    :func:`toad_tpu.models.resnet_encoder.fold_bn`.
    ``x``: [B, H, W, Cin] activations. Returns [B, H/s, W/s, Cout].
    """
    dt = jnp.dtype(compute_dtype)
    flat, meta = _stage_weights(stage_params, dt)
    # static meta via tuple so jit caches per stage shape
    return _stage_call(x, flat, tuple(meta), first_stride,
                       compute_dtype=dt, interpret=interpret)
