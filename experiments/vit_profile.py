"""Where do ViT-L/16 tile-embedding cycles go? (v5e, B=128, 224x224)

Measured baseline ~370 tiles/s ≈ 45 TFLOP/s counted — ~42% of this chip's
achievable GEMM ceiling (108-115, experiments/matmul_ceiling.py), while the
ResNet path runs at ~72%. CLAUDE.md rules out jax.nn.dot_product_attention
("no gain"), so this probe decomposes the block to find the actual sink:

  A. full ViT forward (the bench number)
  B. GEMMs-only transformer (no attention softmax/LN/residual): compute
     upper bound at these exact GEMM shapes
  C. full ViT with tokens padded 197 -> 256 (lane-aligned attention tiles;
     +30% attention FLOPs for alignment)
  D. full ViT in f32 LN/softmax replaced by bf16 (precision-risky; probe
     only, to price the f32 elementwise traffic)

Uses the bench serial-dependency chain (CLAUDE.md methodology). Run on the
real chip: `python experiments/vit_profile.py`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

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


def chain(step, params, n_tiles=None, k=None):
    n_tiles = B if n_tiles is None else n_tiles  # late-bound: tests override B/K
    k = K if k is None else k
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


def gflop_per_tile(tokens=197):
    d, mlp, L = C.width, C.mlp_ratio * C.width, C.depth
    per_tok = 4 * d * d + 2 * d * mlp * 2  # qkv+proj (4d^2) + fc1+fc2 MACs
    attn = 2 * tokens * d  # qk^T + av MACs per token
    return 2 * L * tokens * (per_tok + attn) / 1e9


def main():
    enc = ViTEncoder(C)
    params = enc.init(jax.random.PRNGKey(0))
    results = {}

    # A. full forward
    fn = chain(lambda p, t: enc.embed(p, t), params)
    t = _time(fn, params, jax.random.PRNGKey(1))
    results["A_full_tiles_per_s"] = B * K / t
    results["A_tflops"] = gflop_per_tile() * B * K / t / 1e3

    # B. GEMMs-only upper bound (same shapes, no LN/softmax/residual)
    def gemms_only(p, tiles):
        dt = jnp.bfloat16
        # scalar data dependency on the chained tiles (an unknown value, so
        # XLA can neither fold it away nor hoist the loop body)
        h = jnp.zeros((tiles.shape[0] * 197, C.width), dt) + tiles.reshape(-1)[0].astype(dt)
        for blk in p["blocks"]:
            qkv = h @ blk["qkv"]["w"].astype(dt)
            h = qkv[:, : C.width] @ blk["proj"]["w"].astype(dt)
            m = h @ blk["fc1"]["w"].astype(dt)
            h = m @ blk["fc2"]["w"].astype(dt)
        return h.astype(jnp.float32)

    fnB = chain(gemms_only, params)
    tB = _time(fnB, params, jax.random.PRNGKey(1))
    gemm_gflop = 2 * C.depth * 197 * (4 * C.width**2 + 2 * C.width * C.mlp_ratio * C.width) / 1e9
    results["B_gemms_tiles_per_s"] = B * K / tB
    results["B_tflops"] = gemm_gflop * B * K / tB / 1e3

    # C. token padding 197 -> 256 (pad after patch embed, mask-free: extra
    # tokens are zeros and the cls read ignores them; NOT numerically
    # identical through softmax — probe only)
    def padded_fwd(p, tiles):
        dt = jnp.dtype(C.compute_dtype)
        b = tiles.shape[0]
        x = enc.preprocess(tiles)
        s = C.patch_size
        toks = jax.lax.conv_general_dilated(
            x.astype(dt), p["patch_embed"]["w"].astype(dt), (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dt,
        ).reshape(b, -1, C.width)
        cls = jnp.broadcast_to(p["cls_token"].astype(dt), (b, 1, C.width))
        toks = jnp.concatenate([cls, toks], 1) + p["pos_embed"].astype(dt)
        n_tok = toks.shape[1]
        pad_to = -(-n_tok // 64) * 64  # 197 -> 256: lane-aligned attention tiles
        toks = jnp.pad(toks, ((0, 0), (0, pad_to - n_tok), (0, 0)))
        from toad_tpu.models.vit_encoder import _block

        for blk in p["blocks"]:
            toks = _block(toks, blk, C, dt)
        return _layer_norm(toks[:, 0, :], p["norm"], C.ln_eps).astype(jnp.float32)

    fnC = chain(padded_fwd, params)
    tC = _time(fnC, params, jax.random.PRNGKey(1))
    results["C_padded256_tiles_per_s"] = B * K / tC

    for k, v in results.items():
        print(f"{k}: {v:.1f}")


if __name__ == "__main__":
    main()
