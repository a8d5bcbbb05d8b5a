"""Fused trunk + gated-attention + pooling over padded bags.

This is the hot op of the whole framework — per bag it covers the entire
pipeline of the reference forward pass (``models/model_toad.py:90-99``):

    h = relu(x @ W1 + b1); h = relu(h @ W2 + b2)          # trunk MLP
    a = tanh(h @ Wa + ba); g = sigmoid(h @ Wb + bb)       # gate
    s = (a * g) @ Wc + bc                                  # [N, T] scores
    A = masked_softmax(s^T); M = A @ h                     # [T, H] pooled

Two implementations with identical semantics:

- ``impl='xla'``: straight jnp — XLA already fuses the elementwise chain into
  the matmuls; this is the autodiff-friendly default.
- ``impl='pallas'``: a Pallas TPU kernel that streams N-tiles of the bag
  through VMEM with an online (flash-style) masked softmax, so the [N, H]
  trunk activations never round-trip to HBM. Exact because attention pooling
  is a single softmax-weighted mean, not pairwise attention.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from toad_tpu.ops.pooling import masked_attention_pool


def _trunk_scores(params: dict[str, Any], x: jax.Array, compute_dtype=jnp.float32, drop=None):
    """Shared math: trunk MLP then gated attention scores.

    x: [B, N, D] -> (h [B, N, H], scores [B, N, T])

    ``drop(site, value)`` is an optional hook applied at the reference's four
    dropout positions (after each trunk ReLU, after tanh, after sigmoid —
    ``model_toad.py:59-64,27-29``); the ONE definition of this forward serves
    both the eval path (drop=None) and the training path.
    """
    dt = compute_dtype
    d = drop if drop is not None else (lambda i, v: v)
    w1, b1 = params["trunk"]["fc1"]["w"].astype(dt), params["trunk"]["fc1"]["b"].astype(dt)
    w2, b2 = params["trunk"]["fc2"]["w"].astype(dt), params["trunk"]["fc2"]["b"].astype(dt)
    wa, ba = params["attn"]["a"]["w"].astype(dt), params["attn"]["a"]["b"].astype(dt)
    gated = "b" in params["attn"]
    if gated:
        wb, bb = params["attn"]["b"]["w"].astype(dt), params["attn"]["b"]["b"].astype(dt)
    wc, bc = params["attn"]["c"]["w"].astype(dt), params["attn"]["c"]["b"].astype(dt)

    x = x.astype(dt)
    h = d(0, jax.nn.relu(jnp.einsum("bnd,dh->bnh", x, w1, preferred_element_type=dt) + b1))
    h = d(1, jax.nn.relu(jnp.einsum("bnh,hk->bnk", h, w2, preferred_element_type=dt) + b2))
    a = d(2, jnp.tanh(jnp.einsum("bnh,ha->bna", h, wa, preferred_element_type=dt) + ba))
    if gated:
        g = d(3, jax.nn.sigmoid(jnp.einsum("bnh,ha->bna", h, wb, preferred_element_type=dt) + bb))
        a = a * g
    scores = jnp.einsum("bna,at->bnt", a, wc, preferred_element_type=jnp.float32) + bc.astype(jnp.float32)
    return h, scores


def fused_trunk_attention_pool(
    params: dict[str, Any],
    x: jax.Array,  # [B, N, D]
    mask: jax.Array,  # [B, N]
    *,
    impl: str = "xla",
    compute_dtype=jnp.float32,
    return_scores: bool = False,
    with_attention: bool = True,
):
    """Returns (M [B, T, H] pooled fp32, A [B, T, N] softmax weights[, scores]).

    ``with_attention=False`` (classification-only: no heatmaps, no A_raw) lets
    the Pallas kernel skip writing the [B, T, N] score tensor to HBM entirely
    and returns A=None; the XLA path needs the weights to pool, so the flag
    only elides the returned copies there.
    """
    if impl == "pallas":
        if "b" not in params["attn"]:
            impl = "xla"  # the fused kernel implements the gated variant only
        else:
            from toad_tpu.ops.pallas_pool import pallas_trunk_attention_pool

            return pallas_trunk_attention_pool(
            params, x, mask, compute_dtype=compute_dtype, return_scores=return_scores,
            with_attention=with_attention or return_scores,
        )
    h, scores = _trunk_scores(params, x, compute_dtype)
    m, attn = masked_attention_pool(scores, h.astype(jnp.float32), mask)
    if return_scores:
        return m, attn, scores
    if not with_attention:
        return m, None
    return m, attn
