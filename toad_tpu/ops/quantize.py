"""Dynamic int8 quantization for the MIL pooling fast path.

The v5e MXU runs int8 x int8 -> int32 GEMMs markedly faster than bf16: the
fused pooling chain measures 5.42 ms vs 7.24 ms bf16 at [32, 8192, 1024]
(+34%, ``experiments/int8_probe.py``), and int8 feature bags halve
host->device bytes versus bf16 on top of it. The scheme is standard dynamic
(LLM.int8-style) quantization — nothing is calibrated offline:

- activations: per-ROW scales, ``q = clip(round(x * 127 / amax(|row|)))``,
  computed where the bag is already being touched (bag load / batch
  assembly), so the kernel reads int8 straight from HBM;
- weights: per-COLUMN scales (per output channel), quantized once at model
  load. Only the three big trunk/gate matmuls (W1, W2, Wa|Wb) are int8; the
  tiny score head Wc, biases, softmax bookkeeping, and the classifier heads
  stay f32/bf16.

Dequantization is exact: ``y_f32 = y_int32 * s_row[:, None] * s_col[None, :]``
— both GEMM operands are true integers, so the kernel and the jnp oracle
(:func:`xla_int8_pool`) agree bit-for-bit on the integer part.

The reference has no quantized path (torch f32 throughout,
``models/model_toad.py:90-99``); this is a TPU-native serving capability.
Accuracy impact is measured, not assumed: see ``tests/test_int8.py`` and
PARITY.md (int8 section).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def quantize_rows_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, D] float -> (int8 [N, D], f32 per-row scales [N]).

    ``x ≈ q * scales[:, None]``. All-zero rows get q=0 with the amax floored
    at 1e-6 (scale 1e-6/127) — exact regardless of the scale value, so
    consumers are free to fill padding-slot scales with any positive number
    (DynamicBatcher._assemble uses 1/127); never rely on a particular scale
    for q=0 rows. Host-side (numpy) twin of :func:`quantize_rows`.
    """
    x = np.asarray(x, np.float32)
    amax = np.max(np.abs(x), axis=1)
    scale = np.maximum(amax, 1e-6) / 127.0
    q = np.clip(np.rint(x / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side twin of :func:`quantize_rows_np` (any leading batch dims:
    quantizes along the last axis)."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[D_in, D_out] float -> (int8, f32 per-column scales [D_out])."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_pool_params(params: Params) -> Params:
    """ToadMIL params -> int8 pooling weights (gated attention only).

    Returns a flat dict consumed by the int8 pooling paths:
    ``w1q/sw1/b1, w2q/sw2/b2, wabq/swab/bab, wc/bc`` — the gate branches
    Wa|Wb concatenated like the bf16 kernel's ``_pad_params`` so one wider
    MXU matmul serves both. Heads are NOT here: callers keep using the f32
    ``cls_head``/``site_head`` from the original params.
    """
    if "b" not in params["attn"]:
        raise ValueError("int8 pooling implements the gated attention variant only")
    w1q, sw1 = _quant_cols(params["trunk"]["fc1"]["w"])
    w2q, sw2 = _quant_cols(params["trunk"]["fc2"]["w"])
    wab = jnp.concatenate(
        [jnp.asarray(params["attn"]["a"]["w"], jnp.float32),
         jnp.asarray(params["attn"]["b"]["w"], jnp.float32)], axis=1
    )
    wabq, swab = _quant_cols(wab)
    return {
        "w1q": w1q, "sw1": sw1, "b1": jnp.asarray(params["trunk"]["fc1"]["b"], jnp.float32),
        "w2q": w2q, "sw2": sw2, "b2": jnp.asarray(params["trunk"]["fc2"]["b"], jnp.float32),
        "wabq": wabq, "swab": swab,
        "bab": jnp.concatenate([jnp.asarray(params["attn"]["a"]["b"], jnp.float32),
                                jnp.asarray(params["attn"]["b"]["b"], jnp.float32)]),
        "wc": jnp.asarray(params["attn"]["c"]["w"], jnp.float32),
        "bc": jnp.asarray(params["attn"]["c"]["b"], jnp.float32),
    }


def xla_int8_pool(
    qparams: Params,
    xq: jax.Array,  # [B, N, D] int8
    sx: jax.Array,  # [B, N] f32 per-row scales
    mask: jax.Array,  # [B, N]
):
    """jnp reference of the int8 fused pool — the parity oracle for the
    Pallas int8 kernel and the off-TPU execution path.

    Returns (m [B, T, H] f32, scores [B, N, T] f32) where T is the real task
    count (no T_PAD padding). Same math as
    :func:`toad_tpu.ops.fused_pool.fused_trunk_attention_pool` but with the
    three big GEMMs int8 x int8 -> int32, dequantized per (row, col).
    """
    a_dim = qparams["wabq"].shape[1] // 2
    y1 = jax.lax.dot_general(
        xq, qparams["w1q"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    h = jax.nn.relu(y1 * sx[..., None] * qparams["sw1"][None, None, :] + qparams["b1"])
    hq, sh = quantize_rows(h)
    y2 = jax.lax.dot_general(
        hq, qparams["w2q"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    h2 = jax.nn.relu(y2 * sh[..., None] * qparams["sw2"][None, None, :] + qparams["b2"])
    h2q, sh2 = quantize_rows(h2)
    uv = jax.lax.dot_general(
        h2q, qparams["wabq"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    uv = uv * sh2[..., None] * qparams["swab"][None, None, :] + qparams["bab"]
    gated = jnp.tanh(uv[..., :a_dim]) * jax.nn.sigmoid(uv[..., a_dim:])
    scores = jnp.einsum("bna,at->bnt", gated, qparams["wc"],
                        preferred_element_type=jnp.float32) + qparams["bc"]

    from toad_tpu.ops.pooling import masked_attention_pool

    m, _attn = masked_attention_pool(scores, h2, mask)
    return m, scores
