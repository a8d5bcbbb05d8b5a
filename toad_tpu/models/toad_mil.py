"""ToadMIL — attention-MIL with multi-task heads, batched + masked.

Functional re-design of the reference ``TOAD_fc_mtl_concat``
(``models/model_toad.py:53-116``): same math, different shape discipline —
everything is batched ``[B, N, ...]`` with padding masks so whole epochs run
as a handful of jitted programs instead of one Python iteration per slide.

Architecture (size_arg 'big', reference ``:56-73``):
  trunk   : 1024 -> 512 relu [-> drop .25] -> 512 relu [-> drop .25]
  attn    : gated tanh(W_a h) * sigmoid(W_b h) -> W_c -> [N, 2] scores
            (one score column per task; reference ``Attn_Net_Gated`` ``:17-41``)
  pooling : per-task masked softmax over N, weighted mean -> [2, 512]
  concat  : patient sex appended -> [2, 513]  (reference ``:99``)
  heads   : task0 -> n_classes logits, task1 -> 2 site logits

Init matches the reference's ``initialize_weights`` (``utils/utils.py:150-154``):
Xavier-normal weights, zero biases. The un-gated attention variant is
implemented too (the reference's ``gate=False`` path is a NameError,
SURVEY §2.3.3 — here it works: scores = W_c tanh(W_a h)).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from toad_tpu.config import ModelConfig
from toad_tpu.ops.fused_pool import fused_trunk_attention_pool, _trunk_scores
from toad_tpu.ops.pooling import masked_attention_pool

Params = dict[str, Any]


class ToadOutputs(NamedTuple):
    """Batched analog of the reference results dict (``model_toad.py:109-116``)."""

    logits: jax.Array  # [B, n_classes]
    y_prob: jax.Array  # [B, n_classes]
    y_hat: jax.Array  # [B]
    site_logits: jax.Array  # [B, 2]
    site_prob: jax.Array  # [B, 2]
    site_hat: jax.Array  # [B]
    attention: jax.Array  # [B, T, N] raw (pre-softmax) scores, task-major
    features: jax.Array  # [B, T, H+1] pooled+sex slide representation


def _xavier_normal(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return (jax.random.normal(key, shape) * std).astype(dtype)


def _linear_init(key, d_in, d_out, dtype):
    return {"w": _xavier_normal(key, (d_in, d_out), dtype), "b": jnp.zeros((d_out,), dtype)}


class ToadMIL:
    """init/apply container (pure functions; params are a plain pytree)."""

    def __init__(self, config: ModelConfig):
        self.config = config
        self.n_tasks = 2

    # -- params ---------------------------------------------------------------

    def init(self, key: jax.Array) -> Params:
        c = self.config
        dtype = jnp.dtype(c.param_dtype)
        keys = jax.random.split(key, 7)
        params: Params = {
            "trunk": {
                "fc1": _linear_init(keys[0], c.in_dim, c.hidden_dim, dtype),
                "fc2": _linear_init(keys[1], c.hidden_dim, c.hidden_dim, dtype),
            },
            "attn": (
                {
                    "a": _linear_init(keys[2], c.hidden_dim, c.attn_dim, dtype),
                    "b": _linear_init(keys[3], c.hidden_dim, c.attn_dim, dtype),
                    "c": _linear_init(keys[4], c.attn_dim, self.n_tasks, dtype),
                }
                if c.gate
                else {
                    # un-gated variant: scores = Wc tanh(Wa h) — works here,
                    # unlike the reference's NameError (SURVEY §2.3.3)
                    "a": _linear_init(keys[2], c.hidden_dim, c.attn_dim, dtype),
                    "c": _linear_init(keys[4], c.attn_dim, self.n_tasks, dtype),
                }
            ),
            "cls_head": _linear_init(keys[5], c.hidden_dim + 1, c.n_classes, dtype),
            "site_head": _linear_init(keys[6], c.hidden_dim + 1, c.n_site_classes, dtype),
        }
        return params

    def param_count(self, params: Params) -> int:
        from toad_tpu.utils import param_count

        return param_count(params)

    # -- forward ---------------------------------------------------------------

    def apply(
        self,
        params: Params,
        x: jax.Array,  # [B, N, D]
        mask: jax.Array,  # [B, N]
        sex: jax.Array,  # [B] (0/1)
        *,
        train: bool = False,
        rng: jax.Array | None = None,
        attention_only: bool = False,
        need_attention: bool = True,
    ):
        c = self.config
        compute_dtype = jnp.dtype(c.compute_dtype)
        need_attention = need_attention or attention_only

        if train and c.dropout:
            if rng is None:
                raise ValueError("dropout requires an rng key in train mode")
            m, attn, scores = self._forward_dropout(params, x, mask, rng)
        elif need_attention:
            impl = "pallas" if (c.use_pallas and not train) else "xla"
            m, attn, scores = fused_trunk_attention_pool(
                params, x, mask, impl=impl, compute_dtype=compute_dtype, return_scores=True
            )
        else:
            # classification-only fast path: the Pallas kernel never writes
            # the [B, T, N] score tensor to HBM
            impl = "pallas" if (c.use_pallas and not train) else "xla"
            m, _ = fused_trunk_attention_pool(
                params, x, mask, impl=impl, compute_dtype=compute_dtype, with_attention=False
            )
            scores = None

        return self._finish(params, m, scores, mask, sex, attention_only)

    def apply_int8(
        self,
        params: Params,
        qparams: Params,
        xq: jax.Array,  # [B, N, D] int8 (pre-quantized rows, ops/quantize.py)
        sx: jax.Array,  # [B, N] f32 per-row scales
        mask: jax.Array,  # [B, N]
        sex: jax.Array,  # [B]
        *,
        need_attention: bool = True,
        attention_only: bool = False,
    ):
        """Quantized-inference forward: the trunk/gate GEMMs run int8 on the
        MXU (+34% over bf16, and int8 bags halve H2D bytes — see
        ``ops/quantize.py``). ``qparams`` comes from
        :func:`toad_tpu.ops.quantize.quantize_pool_params`; heads/softmax
        stay f32, so outputs share :meth:`apply`'s contract exactly. No
        reference analog (torch f32 throughout, ``model_toad.py:90-99``)."""
        need_attention = need_attention or attention_only
        if self.config.use_pallas:
            from toad_tpu.ops.pallas_pool import pallas_pool_int8

            if need_attention:
                m, _attn, scores = pallas_pool_int8(qparams, xq, sx, mask, return_scores=True)
            else:
                m, _ = pallas_pool_int8(qparams, xq, sx, mask, with_attention=False)
                scores = None
        else:
            from toad_tpu.ops.quantize import xla_int8_pool

            m, scores = xla_int8_pool(qparams, xq, sx, mask)
            if not need_attention:
                scores = None
        return self._finish(params, m, scores, mask, sex, attention_only)

    def _finish(self, params: Params, m, scores, mask, sex, attention_only: bool):
        """Shared tail: A_raw masking, sex concat, dual heads, output pack."""
        if scores is not None:
            # raw task-major scores [B, T, N] — reference A_raw (model_toad.py:96)
            a_raw = jnp.where(mask[:, None, :] > 0, jnp.swapaxes(scores, 1, 2), -jnp.inf)
        else:
            a_raw = None
        if attention_only:
            return a_raw[:, 0, :]

        sex_col = sex.astype(jnp.float32)[:, None, None]  # [B, 1, 1]
        sex_col = jnp.broadcast_to(sex_col, (m.shape[0], self.n_tasks, 1))
        feats = jnp.concatenate([m, sex_col], axis=-1)  # [B, T, H+1]

        logits = feats[:, 0, :] @ params["cls_head"]["w"].astype(jnp.float32) + params["cls_head"]["b"]
        site_logits = feats[:, 1, :] @ params["site_head"]["w"].astype(jnp.float32) + params["site_head"]["b"]

        return ToadOutputs(
            logits=logits,
            y_prob=jax.nn.softmax(logits, axis=-1),
            y_hat=jnp.argmax(logits, axis=-1),
            site_logits=site_logits,
            site_prob=jax.nn.softmax(site_logits, axis=-1),
            site_hat=jnp.argmax(site_logits, axis=-1),
            attention=a_raw,
            features=feats,
        )

    def _forward_dropout(self, params: Params, x, mask, rng):
        """Training path with dropout p=0.25 at the reference's positions,
        reusing the ONE shared forward (:func:`_trunk_scores`) with a
        per-site dropout hook."""
        c = self.config
        p = c.dropout_rate
        dt = jnp.dtype(c.compute_dtype)
        keys = jax.random.split(rng, 4)

        def drop(site, v):
            keep = jax.random.bernoulli(keys[site], 1.0 - p, v.shape)
            return jnp.where(keep, v / (1.0 - p), 0.0)

        h, scores = _trunk_scores(params, x, dt, drop=drop)
        m, attn = masked_attention_pool(scores, h.astype(jnp.float32), mask)
        return m, attn, scores
