"""Round-4: VPU-lean softmax in the fused ViT MHA kernel — speed + accuracy.

The r4 re-attribution probe (vit_ceiling2_probe) put the fused-MHA residue at
18.5% of ViT-L wall time. The per-head GEMMs are ~2% of FLOPs; the residue is
VPU passes over the [197,197] f32 score tile (scale multiply, exp, divide).
This probe A/Bs a VPU-lean softmax (scale*log2e folded into q pre-MXU, bare
exp2, normalization deferred past @v onto the [197,64] context) against the
shipped exp/pre-normalize form, interleaved in one process, plus feature
deviation of both against the f32 XLA-attention truth.

RESULT (v5e, 2026-08-19, experiments/results/vit_softmax_r4.txt): ruled out.
old 1108.6 / new 1109.0 tiles/s (ratio 1.000, 0.996, 1.003 over 3 interleaved
reps); deviation new-vs-old 5.0e-4 of feature scale. The attention residue is
NOT VPU elementwise work — Mosaic already optimizes the softmax passes; the
cost is the 197-shaped per-head GEMM floor. The shipped kernel keeps the
simpler pre-normalized form (bit-parity with the XLA path). `_mha_new` below
is the rejected variant, kept runnable for re-probing on future libtpu.

Run on the real chip: python experiments/vit_softmax_probe.py
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from experiments.vit_probe_common import make_vit_fwd, serial_time, tile_chain
from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder, _layer_norm
from toad_tpu.ops.vit_attention import fused_mha

B, HW, K = 128, 224, 4
C = ViTConfig()


# -- the REJECTED VPU-lean variant (exp2, q-folded scale, post-@v normalize) -
def _mha_kernel_new(qkv_ref, o_ref, *, heads, head_dim, scale):
    c = scale * 1.4426950408889634  # log2(e)
    blk_b = qkv_ref.shape[0]
    d = heads * head_dim
    for b in range(blk_b):
        ctx = []
        for h in range(heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, d + h * head_dim: d + (h + 1) * head_dim]
            v = qkv_ref[b, :, 2 * d + h * head_dim: 2 * d + (h + 1) * head_dim]
            qs = (q.astype(jnp.float32) * c).astype(qkv_ref.dtype)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(qkv_ref.dtype), v, preferred_element_type=jnp.float32)
            ctx.append(o / denom)
        o_ref[b] = jnp.concatenate(ctx, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "head_dim"))
def fused_mha_new(qkv, heads, head_dim):
    b, n, three_d = qkv.shape
    d = heads * head_dim
    block_b = max(1, min(4, b, int(26e6 // (15 * n * d * qkv.dtype.itemsize))))
    kernel = functools.partial(
        _mha_kernel_new, heads=heads, head_dim=head_dim, scale=float(head_dim) ** -0.5
    )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[pl.BlockSpec((block_b, n, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
    )(qkv)


def make_block(attn_impl):
    def block(x, blk, dt):
        h = _layer_norm(x, blk["norm1"], C.ln_eps).astype(dt)
        qkv = h @ blk["qkv"]["w"].astype(dt) + blk["qkv"]["b"].astype(dt)
        o = attn_impl(qkv)
        o = o @ blk["proj"]["w"].astype(dt) + blk["proj"]["b"].astype(dt)
        if "ls1" in blk:
            o = o * blk["ls1"].astype(dt)
        x = x + o
        h = _layer_norm(x, blk["norm2"], C.ln_eps).astype(dt)
        h = jax.nn.gelu(h @ blk["fc1"]["w"].astype(dt) + blk["fc1"]["b"].astype(dt), approximate=True)
        h = h @ blk["fc2"]["w"].astype(dt) + blk["fc2"]["b"].astype(dt)
        if "ls2" in blk:
            h = h * blk["ls2"].astype(dt)
        return x + h

    return block


def main():
    enc = ViTEncoder(C)
    params = enc.init(jax.random.PRNGKey(0))

    new = lambda qkv: fused_mha_new(qkv, C.heads, C.head_dim)  # noqa: E731
    old = lambda qkv: fused_mha(qkv, C.heads, C.head_dim)  # shipped kernel  # noqa: E731
    fn_new = tile_chain(make_vit_fwd(C, enc, make_block(new)), B, HW, K)
    fn_old = tile_chain(make_vit_fwd(C, enc, make_block(old)), B, HW, K)

    # interleaved A/B x3 (tenancy drift can't favor one arm)
    for rep in range(3):
        t_old = serial_time(fn_old, params, jax.random.PRNGKey(1), runs=2)
        t_new = serial_time(fn_new, params, jax.random.PRNGKey(1), runs=2)
        print(f"rep{rep}: old {B*K/t_old:.1f} new {B*K/t_new:.1f} tiles/s "
              f"(ratio {t_old/t_new:.3f})", flush=True)

    # accuracy: deviation vs the f32 XLA-attention truth at small batch
    cfg32 = ViTConfig(**{**C.__dict__, "compute_dtype": "float32", "attention": "xla"})
    enc32 = ViTEncoder(cfg32)
    tiles = jax.random.uniform(jax.random.PRNGKey(9), (8, HW, HW, 3), jnp.float32)
    truth = np.asarray(enc32.embed(params, tiles), np.float32)
    sc = float(np.abs(truth).mean())

    fwd_new = make_vit_fwd(C, enc, make_block(new))
    fwd_old = make_vit_fwd(C, enc, make_block(old))
    f_new = np.asarray(jax.jit(fwd_new)(params, tiles.astype(jnp.bfloat16)), np.float32)
    f_old = np.asarray(jax.jit(fwd_old)(params, tiles.astype(jnp.bfloat16)), np.float32)
    print(f"deviation vs f32 truth (fraction of mean |feature| {sc:.4f}):")
    print(f"  old kernel: {np.abs(f_old - truth).max() / sc:.2e}")
    print(f"  new kernel: {np.abs(f_new - truth).max() / sc:.2e}")
    print(f"  new vs old: {np.abs(f_new - f_old).max() / sc:.2e}")


if __name__ == "__main__":
    main()
