"""Post-fused-MHA ViT profile: price the remaining elementwise work.

After ops/vit_attention.py (950 t/s), the remaining gap to the GEMMs-only
bound (1739 t/s) is ~55 ms/128-batch of LN/GELU/residual/patch-embed — now
bigger than the attention core. Variants (full fused-attention model):

  A. production (f32 LN stats, exact GELU)            — control
  D1. LN computed in bf16 (stats included)            — halves LN traffic
  D2. GELU approximate (tanh form)                    — cheaper transcendental
  D3. D1 + D2

Measured (recorded in CLAUDE.md/BASELINE.md): A=939.7, D1=924.9 (slower AND
9.2e-3 deviation — rejected), D2=1114.6 at 1.9e-4 (adopted as gelu="auto").

Each reports tiles/s AND the relative feature deviation vs production — the
numerics price of any win. Run: python experiments/vit_elementwise_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from experiments.vit_probe_common import make_vit_fwd, serial_time, tile_chain
from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder
from toad_tpu.ops.vit_attention import fused_mha

B, HW, K = 128, 224, 4
C = ViTConfig(attention="fused")


def make_ln(bf16_ln: bool):
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

    return ln


def make_fwd(bf16_ln: bool, tanh_gelu: bool):
    enc = ViTEncoder(C)
    ln = make_ln(bf16_ln)

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

    # the LN variant under test applies to the final cls-token norm too
    return make_vit_fwd(C, enc, block, final_norm=ln)


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
        t = serial_time(tile_chain(fwd, B, HW, K), params, jax.random.PRNGKey(1))
        out = np.asarray(fwd(params, small))
        dev = np.max(np.abs(out - base_small)) / (np.max(np.abs(base_small)) + 1e-9)
        print(f"{name}: {B * K / t:.1f} tiles/s  rel_dev={dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
