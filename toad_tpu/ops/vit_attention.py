"""Pallas TPU kernel: fused multi-head self-attention for the ViT encoder.

Why this exists (measured, v5e, ViT-L/16 @ 224, B=128 —
``experiments/vit_attn_probe.py``): the XLA attention core costs 43% of the
encoder's wall time (full fwd 565.5 tiles/s vs 994.4 with attention replaced
by identity), because XLA materializes the ``[B, H, N, N]`` f32 score tensor
to HBM (318 MB per layer at B=128), runs softmax over it, and reads it back —
three HBM round-trips per layer for math whose operands fit comfortably in
VMEM. ``jax.nn.dot_product_attention`` is identical (566.0 t/s — it lowers
to the same XLA ops on TPU).

This kernel keeps one block of images' qkv resident in VMEM and runs
qk^T -> softmax -> @v per head entirely on-chip: HBM traffic per layer drops
to reading qkv (bf16) and writing the context (bf16) once. The per-head
GEMMs are small (N=197, Dh=64 — half-lane contractions), but attention FLOPs
are ~2% of the block's total, so MXU efficiency here is irrelevant next to
the saved bandwidth.

Layout contract: ``qkv`` is the raw ``[B, N, 3*D]`` projection output
(bias added), columns ``[q_h0..q_h15 | k_h0..k_h15 | v_h0..v_h15]`` with
each head a contiguous ``head_dim`` slice — exactly what
``toad_tpu/models/vit_encoder._block`` produces, so no XLA-side transpose
or reshape feeds the kernel. Head slices at 64-lane offsets cost a lane
rotation for odd heads; the context heads are concatenated in-register and
written as one ``[N, D]`` store.

Forward-only (featurization/serving); ViT training is out of scope for this
framework (the encoder is frozen in the TOAD pipeline — reference
``models/resnet_custom.py:111-119`` ships a frozen encoder the same way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(qkv_ref, o_ref, *, heads: int, head_dim: int, scale: float):
    # NOTE: a VPU-lean softmax variant (scale*log2e folded into q, bare exp2,
    # normalization deferred past @v) was measured at EXACTLY this kernel's
    # speed (1108.6 vs 1109.0 tiles/s, 3 interleaved reps —
    # experiments/vit_softmax_probe.py): the attention residue is the
    # 197-shaped per-head GEMM floor, not VPU elementwise work, so the
    # simpler form (bit-parity with the XLA path at b=4) is kept.
    blk_b = qkv_ref.shape[0]
    d = heads * head_dim
    for b in range(blk_b):
        ctx = []
        for h in range(heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, d + h * head_dim: d + (h + 1) * head_dim]
            v = qkv_ref[b, :, 2 * d + h * head_dim: 2 * d + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            p = jax.nn.softmax(s * scale, axis=-1).astype(qkv_ref.dtype)
            ctx.append(jnp.dot(p, v, preferred_element_type=jnp.float32))
        o_ref[b] = jnp.concatenate(ctx, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "head_dim", "block_b", "interpret"))
def fused_mha(
    qkv: jax.Array,
    heads: int,
    head_dim: int,
    *,
    block_b: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """``[B, N, 3*H*Dh]`` qkv (head-major column layout, see module doc) ->
    ``[B, N, H*Dh]`` attention context, softmax statistics in f32.

    ``block_b`` images per grid step (VMEM: ~``block_b * N * 4D * dtype``
    double-buffered — 4 keeps ViT-L @ 197 tokens under the default budget).
    ``interpret=True`` for CPU tests.
    """
    b, n, three_d = qkv.shape
    d = heads * head_dim
    if three_d != 3 * d:
        raise ValueError(f"qkv last dim {three_d} != 3*heads*head_dim {3 * d}")
    # Clamp the block to the scoped-VMEM budget. Empirical footprint (the
    # terminal compiler's own accounting): ~15 * n * d * itemsize per image —
    # the double-buffered qkv+out stream plus per-head f32 score tiles and
    # the in-register context concat. 197-token tiles keep the measured-fast
    # block of 4 (~23 MB); 257-token (256 px) tiles clamp to 3 (22.5 MB
    # measured). The call raises vmem_limit_bytes to 28 MB like the pooling
    # kernel — the 16 MB default rejects both (CLAUDE.md, 2026-01 libtpu
    # accounting).
    bytes_per_image = 15 * n * d * qkv.dtype.itemsize
    block_b = max(1, min(block_b, b, int(26e6 // bytes_per_image)))
    kernel = functools.partial(
        _mha_kernel, heads=heads, head_dim=head_dim, scale=float(head_dim) ** -0.5
    )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, n, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
        interpret=interpret,
    )(qkv)


def mha_reference(qkv: jax.Array, heads: int, head_dim: int) -> jax.Array:
    """jnp oracle with the kernel's exact semantics (f32 scores/softmax, f32
    context accumulation) for parity tests."""
    b, n, _ = qkv.shape
    d = heads * head_dim
    qkv = qkv.reshape(b, n, 3, heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * float(head_dim) ** -0.5, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v, preferred_element_type=jnp.float32)
    return o.reshape(b, n, d).astype(qkv.dtype)
