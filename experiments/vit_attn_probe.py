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

Run on the real chip: python -c "import runpy; runpy.run_path('experiments/vit_attn_probe.py', run_name='__main__')"
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder, _layer_norm

B, HW, K = 128, 224, 4
C = ViTConfig()


def _time(fn, *args, runs=3):
    float(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain(step, n_tiles=B, k=K):
    @jax.jit
    def fn(params, key):
        tiles = jax.random.uniform(key, (n_tiles, HW, HW, 3), jnp.float32).astype(jnp.bfloat16)

        def body(_, carry):
            t, acc = carry
            out = step(params, t)
            return (t + (out.sum() * 1e-12).astype(jnp.bfloat16), acc + out.sum())

        _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.float32(0)))
        return acc

    return fn


def make_fwd(attn_impl):
    """Full ViT forward with a pluggable attention core.
    attn_impl(q, k, v) with [B, N, H, Dh] bf16 -> [B, N, H, Dh] bf16."""
    enc = ViTEncoder(C)

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

    def fwd(params, tiles):
        dt = jnp.dtype(C.compute_dtype)
        x = enc.preprocess(tiles)
        s = C.patch_size
        toks = jax.lax.conv_general_dilated(
            x.astype(dt), params["patch_embed"]["w"].astype(dt), (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dt,
        ).reshape(tiles.shape[0], -1, C.width) + params["patch_embed"]["b"].astype(dt)
        cls = jnp.broadcast_to(params["cls_token"].astype(dt), (tiles.shape[0], 1, C.width))
        toks = jnp.concatenate([cls, toks], 1) + params["pos_embed"].astype(dt)
        for blk in params["blocks"]:
            toks = block(toks, blk, dt)
        return _layer_norm(toks[:, 0, :], params["norm"], C.ln_eps).astype(jnp.float32)

    return fwd


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
        fn = chain(make_fwd(impl))
        t = _time(fn, params, jax.random.PRNGKey(1))
        print(f"{name}_tiles_per_s: {B * K / t:.1f}", flush=True)


if __name__ == "__main__":
    main()
