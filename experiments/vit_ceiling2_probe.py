"""Round-3 follow-up: where is the ViT-L ceiling AFTER fused MHA + tanh-GELU?

The round-3 roofline (BASELINE.md) measured the identity-attention ceiling at
994 tiles/s — but that was with exact (erf) GELU, which the elementwise probe
then showed costs ~18% on the VPU. With tanh-GELU now the bf16 default, the
ceiling moves; this probe re-measures it so the remaining gap attributes
correctly between (a) the fused attention kernel itself, (b) f32 LayerNorm,
and (c) the block GEMMs.

Variants (all tanh-GELU, bf16, B=128, 224x224, serial-chain discipline):
  A. full forward, fused Pallas MHA       (control -- the shipping config)
  B. attention -> identity                 (new attention ceiling)
  C. fused MHA, LayerNorm -> identity      (LN's share, keeping attention)
  D. identity attention AND LN -> identity (GEMM+GELU+residual floor)

Run on the real chip:
  python experiments/vit_ceiling2_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
import jax

from experiments.vit_probe_common import make_vit_fwd, serial_time, tile_chain
from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder, _layer_norm
from toad_tpu.ops.vit_attention import fused_mha

B, HW, K = 128, 224, 4
C = ViTConfig()  # gelu="auto" -> tanh under bf16


def attn_fused(qkv):
    return fused_mha(qkv, C.heads, C.head_dim)


def attn_identity(qkv):
    # keep the v columns flowing (same dataflow/width, no attention math);
    # v occupies the last H*Dh columns in the kernel's head-major layout
    return qkv[..., 2 * C.width :]


def make_block(attn_impl, ln: bool):
    """Per-block math with pluggable attention core and LN on/off.
    attn_impl(qkv [B, N, 3*width] bf16) -> [B, N, width] bf16."""

    def norm(x, p):
        return _layer_norm(x, p, C.ln_eps) if ln else x

    def block(x, blk, dt):
        h = norm(x, blk["norm1"]).astype(dt)
        qkv = h @ blk["qkv"]["w"].astype(dt) + blk["qkv"]["b"].astype(dt)
        o = attn_impl(qkv)
        o = o @ blk["proj"]["w"].astype(dt) + blk["proj"]["b"].astype(dt)
        if "ls1" in blk:
            o = o * blk["ls1"].astype(dt)
        x = x + o
        h = norm(x, blk["norm2"]).astype(dt)
        h = jax.nn.gelu(h @ blk["fc1"]["w"].astype(dt) + blk["fc1"]["b"].astype(dt), approximate=True)
        h = h @ blk["fc2"]["w"].astype(dt) + blk["fc2"]["b"].astype(dt)
        if "ls2" in blk:
            h = h * blk["ls2"].astype(dt)
        return x + h

    return block


def main():
    enc = ViTEncoder(C)
    params = enc.init(jax.random.PRNGKey(0))
    for name, impl, ln in [
        ("A_full_fused", attn_fused, True),
        ("B_identity_attn", attn_identity, True),
        ("C_fused_no_ln", attn_fused, False),
        ("D_identity_no_ln", attn_identity, False),
    ]:
        fwd = make_vit_fwd(C, enc, make_block(impl, ln))
        fn = tile_chain(fwd, B, HW, K)
        t = serial_time(fn, params, jax.random.PRNGKey(1))
        print(f"{name}_tiles_per_s: {B * K / t:.1f}", flush=True)


if __name__ == "__main__":
    main()
