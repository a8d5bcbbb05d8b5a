"""Post-fused-MHA ViT profile: price the remaining elementwise work.

After ops/vit_attention.py (950 t/s), the remaining gap to the GEMMs-only
bound (1739 t/s) is ~55 ms/128-batch of LN/GELU/residual/patch-embed — now
bigger than the attention core. Variants (full fused-attention model):

  A. production (f32 LN stats, exact GELU)            — control
  D1. LN computed in bf16 (stats included)            — halves LN traffic
  D2. GELU approximate (tanh form)                    — cheaper transcendental
  D3. D1 + D2

Each reports tiles/s AND the relative feature deviation vs production — the
numerics price of any win. Run:
python -c "import runpy; runpy.run_path('experiments/vit_elementwise_probe.py', run_name='__main__')"
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder
from toad_tpu.ops.vit_attention import fused_mha

B, HW, K = 128, 224, 4
C = ViTConfig(attention="fused")


def _time(fn, *args, runs=3):
    float(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_fwd(bf16_ln: bool, tanh_gelu: bool):
    enc = ViTEncoder(C)

    def ln(x, p):
        if bf16_ln:
            xb = x.astype(jnp.bfloat16)
            mu = xb.mean(-1, keepdims=True)
            var = ((xb - mu) ** 2).mean(-1, keepdims=True)
            return ((xb - mu) * jax.lax.rsqrt(var + C.ln_eps) * p["scale"].astype(jnp.bfloat16)
                    + p["bias"].astype(jnp.bfloat16))
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return (x32 - mu) * jax.lax.rsqrt(var + C.ln_eps) * p["scale"] + p["bias"]

    def block(x, blk, dt):
        h = ln(x, blk["norm1"]).astype(dt)
        qkv = h @ blk["qkv"]["w"].astype(dt) + blk["qkv"]["b"].astype(dt)
        o = fused_mha(qkv, C.heads, C.head_dim)
        o = o @ blk["proj"]["w"].astype(dt) + blk["proj"]["b"].astype(dt)
        o = o * blk["ls1"].astype(dt)
        x = x + o
        h = ln(x, blk["norm2"]).astype(dt)
        h = jax.nn.gelu(h @ blk["fc1"]["w"].astype(dt) + blk["fc1"]["b"].astype(dt),
                        approximate=tanh_gelu)
        h = h @ blk["fc2"]["w"].astype(dt) + blk["fc2"]["b"].astype(dt)
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
        out = ln(toks[:, 0, :], params["norm"])
        return out.astype(jnp.float32)

    return fwd


def chain(fwd):
    @jax.jit
    def fn(params, key):
        tiles = jax.random.uniform(key, (B, HW, HW, 3), jnp.float32).astype(jnp.bfloat16)

        def body(_, carry):
            t, acc = carry
            out = fwd(params, t)
            return (t + (out.sum() * 1e-12).astype(jnp.bfloat16), acc + out.sum())

        _, acc = jax.lax.fori_loop(0, K, body, (tiles, jnp.float32(0)))
        return acc

    return fn


def main():
    enc = ViTEncoder(C)
    params = enc.init(jax.random.PRNGKey(0))
    small = jax.random.uniform(jax.random.PRNGKey(9), (4, HW, HW, 3), jnp.float32) * 255
    base_fwd = make_fwd(False, False)
    base_small = np.asarray(base_fwd(params, small))
    for name, bf16_ln, tanh_gelu in [
        ("A_prod", False, False),
        ("D1_bf16_ln", True, False),
        ("D2_tanh_gelu", False, True),
        ("D3_both", True, True),
    ]:
        fwd = make_fwd(bf16_ln, tanh_gelu)
        t = _time(chain(fwd), params, jax.random.PRNGKey(1))
        out = np.asarray(fwd(params, small))
        dev = np.max(np.abs(out - base_small)) / (np.max(np.abs(base_small)) + 1e-9)
        print(f"{name}: {B * K / t:.1f} tiles/s  rel_dev={dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
