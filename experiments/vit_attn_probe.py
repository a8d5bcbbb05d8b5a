"""Isolate the ViT-L attention core's wall-time share (v5e, B=128, 224x224).

Follow-up to experiments/vit_profile.py, which measured A(full)=566.7 tiles/s
vs B(GEMMs-only)=1739 — implying the non-GEMM attention core (f32 [B,H,197,197]
score materialization + softmax + transposes) dominates. Variants here:

  A. full forward (control, same as vit_profile A)
  E. attention replaced by identity (keep LN/qkv/proj/mlp/residual/LayerScale)
     -> A - E = the attention core's cost
  F. jax.nn.dot_product_attention instead of the hand einsum+softmax
     (re-check of the CLAUDE.md ruling now that the core is known to matter)
  G. bf16 score accumulation (einsum in bf16, softmax still f32 stats)

Measured (recorded in BASELINE.md): A=565.5, E=994.4, F=566.0, G=588.7 —
the fix was the fused Pallas kernel (ops/vit_attention.py), not these.

Run on the real chip: python experiments/vit_attn_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
import jax
import jax.numpy as jnp

from experiments.vit_probe_common import make_vit_fwd, serial_time, tile_chain
from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder, _layer_norm

B, HW, K = 128, 224, 4
C = ViTConfig()


def make_block(attn_impl):
    """Per-block math with pluggable attention core, exact (erf) GELU — the
    pre-tanh-GELU production config these numbers were recorded under.
    attn_impl(q, k, v) with [B, N, H, Dh] bf16 -> [B, N, H, Dh] bf16."""

    def block(x, blk, dt):
        h = _layer_norm(x, blk["norm1"], C.ln_eps).astype(dt)
        qkv = h @ blk["qkv"]["w"].astype(dt) + blk["qkv"]["b"].astype(dt)
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, 3, C.heads, C.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = attn_impl(q, k, v).reshape(b, n, C.width)
        o = o @ blk["proj"]["w"].astype(dt) + blk["proj"]["b"].astype(dt)
        if "ls1" in blk:
            o = o * blk["ls1"].astype(dt)
        x = x + o
        h = _layer_norm(x, blk["norm2"], C.ln_eps).astype(dt)
        h = jax.nn.gelu(h @ blk["fc1"]["w"].astype(dt) + blk["fc1"]["b"].astype(dt), approximate=False)
        h = h @ blk["fc2"]["w"].astype(dt) + blk["fc2"]["b"].astype(dt)
        if "ls2" in blk:
            h = h * blk["ls2"].astype(dt)
        return x + h

    return block


def attn_reference(q, k, v):
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * (C.head_dim**-0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v, preferred_element_type=q.dtype)


def attn_identity(q, k, v):
    # keeps the v tensor flowing (same dataflow shape, no attention math)
    return v


def attn_dpa(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)  # [B, N, H, Dh] layout matches


def attn_bf16_scores(q, k, v):
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=q.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32) * (C.head_dim**-0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v, preferred_element_type=q.dtype)


def main():
    enc = ViTEncoder(C)
    params = enc.init(jax.random.PRNGKey(0))
    for name, impl in [
        ("A_full", attn_reference),
        ("E_identity", attn_identity),
        ("F_dpa", attn_dpa),
        ("G_bf16_scores", attn_bf16_scores),
    ]:
        fwd = make_vit_fwd(C, enc, make_block(impl))
        fn = tile_chain(fwd, B, HW, K)
        t = serial_time(fn, params, jax.random.PRNGKey(1))
        print(f"{name}_tiles_per_s: {B * K / t:.1f}", flush=True)


if __name__ == "__main__":
    main()
