"""Masked attention pooling — the MIL core, batched over bags.

The reference computes, per single bag (``models/model_toad.py:90-99``):
``A = softmax(scores^T, axis=N); M = A @ h`` — a softmax-weighted mean of
patch embeddings per task. Here the same math is batched ``[B, N, ...]``
with a padding mask, which is *exact*: masked patches get -inf score and
therefore zero weight. This file is the jnp reference implementation; the
fused Pallas kernel (:mod:`toad_tpu.ops.fused_pool`) must match it bitwise
within tolerance (tested in ``tests/test_pallas.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically-stable softmax over `axis`, assigning zero weight where
    mask == 0. `scores` [..., N], `mask` broadcastable [..., N]."""
    scores = jnp.where(mask > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=axis, keepdims=True)
    # guard fully-masked rows: max is NEG_INF there, exp(0)=1 then normalized
    m = jnp.where(m <= NEG_INF / 2, 0.0, m)
    e = jnp.exp(scores - m) * (mask > 0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    # guard epsilon must survive squaring in f32: the div VJP computes
    # cot·x/denom², and 1e-30² underflows to 0 → 0/0 NaN on fully-masked
    # padding rows (transient — maximum's select-VJP discards it — but it
    # trips jax_debug_nans/checkify). Real rows have denom ≥ 1 (max-shifted
    # exp), so 1e-12 is semantically identical.
    return e / jnp.maximum(denom, 1e-12)


def masked_attention_pool(
    scores: jax.Array,  # [B, N, T] raw attention logits, one column per task
    h: jax.Array,  # [B, N, H] patch embeddings
    mask: jax.Array,  # [B, N]
) -> tuple[jax.Array, jax.Array]:
    """Softmax-weighted mean per task.

    Returns (M [B, T, H], A [B, T, N] softmax weights).
    Equivalent to the reference's ``softmax(A^T) @ h`` (``model_toad.py:97-98``)
    for each bag, extended with padding masks.
    """
    a_t = jnp.swapaxes(scores, 1, 2)  # [B, T, N]
    attn = masked_softmax(a_t, mask[:, None, :], axis=-1)
    m = jnp.einsum("btn,bnh->bth", attn, h, preferred_element_type=jnp.float32)
    return m, attn
