"""Decompose the long-bag (B=1, N=131072) pooling latency anomaly.

bench_long_bag measures 7.29 ms/bag = ~42 TFLOP/s while the batched bench
(B=32, N=8192) runs the SAME per-step kernel work at 106 TFLOP/s. Candidates:

  a. harness: the serial-dependency bump `f + bump` rewrites the whole
     268 MB bf16 bag between forwards (bandwidth, not kernel time);
  b. per-grid-step overhead at 128 sequential steps;
  c. kernel-side inefficiency at B=1.

Variants timed here (real chip):
  1. full-bump chain    — bench_long_bag as-is (control);
  2. element-bump chain — serial dependency through ONE scalar of the bag
     (dynamic_update_slice of f[0,0:1,0:1]); kills the full-bag rewrite
     while still ordering the forwards;
  3. tile=2048          — same as (2) but the Pallas single-bag grid uses
     2048-row tiles with vmem_limit=32MB (the old "tiles>1024 exhaust VMEM"
     ruling predates the scoped-limit discovery made for the pair path).

Run: python experiments/longbag_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from toad_tpu.config import ModelConfig
    from toad_tpu.models.toad_mil import ToadMIL
    from toad_tpu.ops import pallas_pool as pp

    DIM, N_CLASSES = 1024, 18
    n, k = 131072, 8
    cfg = ModelConfig(in_dim=DIM, n_classes=N_CLASSES, compute_dtype="bfloat16", use_pallas=True)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))

    def time_best(fn, runs=3):
        float(fn(0))  # compile
        best = float("inf")
        for i in range(runs):
            t0 = time.perf_counter()
            float(fn(i + 1))
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- 1. control: full-bag bump (bench harness as-is), at two chain
    # lengths. The absolute number folds in the one-off 268 MB threefry RNG
    # (big at k=8); the MARGINAL cost (T(4k) - T(k)) / 3k is the honest
    # steady-state per-bag latency with setup amortized out.
    def make_full_bump(kk):
        @jax.jit
        def full_bump(params, key):
            f = jax.random.normal(key, (1, n, DIM), jnp.float32).astype(jnp.bfloat16)
            mask = jnp.ones((1, n), jnp.float32)
            sex = jnp.zeros((1,), jnp.int32)

            def body(_, carry):
                f, acc = carry
                out = model.apply(params, f, mask, sex, train=False, need_attention=False)
                bump = ((out.y_prob.sum() + out.site_prob.sum()) * 1e-12).astype(jnp.bfloat16)
                return (f + bump, acc + out.y_prob.sum())

            _, acc = jax.lax.fori_loop(0, kk, body, (f, jnp.float32(0)))
            return acc

        return full_bump

    fb8, fb32 = make_full_bump(k), make_full_bump(4 * k)
    t1 = time_best(lambda i: fb8(params, jax.random.PRNGKey(2 + i)))
    t1b = time_best(lambda i: fb32(params, jax.random.PRNGKey(2 + i)))
    marginal = (t1b - t1) / (3 * k)
    print(f"1. full-bump chain   : {t1 / k * 1e3:8.3f} ms/bag at k={k}, "
          f"{t1b / (4 * k) * 1e3:8.3f} at k={4 * k}; marginal {marginal * 1e3:.3f} ms/bag "
          f"(setup incl. RNG: {(t1 - marginal * k) * 1e3:.1f} ms)")

    # ---- 2. element bump: serial dependency through one scalar
    def make_elem_bump(pool_fn, kk):
        @jax.jit
        def elem_bump(params, key):
            f = jax.random.normal(key, (1, n, DIM), jnp.float32).astype(jnp.bfloat16)
            mask = jnp.ones((1, n), jnp.float32)
            sex = jnp.zeros((1,), jnp.int32)

            def body(_, carry):
                f, acc = carry
                out = pool_fn(params, f, mask, sex)
                bump = (out.sum() * 1e-12).astype(jnp.bfloat16)
                f = jax.lax.dynamic_update_slice(
                    f, f[:, :1, :1] + bump, (0, 0, 0)
                )
                return (f, acc + out.sum())

            _, acc = jax.lax.fori_loop(0, kk, body, (f, jnp.float32(0)))
            return acc

        return elem_bump

    def apply_pool(params, f, mask, sex):
        out = model.apply(params, f, mask, sex, train=False, need_attention=False)
        return out.y_prob.sum() + out.site_prob.sum()

    def marginal_of(make_fn):
        # build the jitted fns ONCE outside the timed lambda — rebuilding per
        # run would retrace/recompile every call and time the compiler instead
        f8, f32_ = make_fn(k), make_fn(4 * k)
        ta = time_best(lambda i: f8(params, jax.random.PRNGKey(2 + i)))
        tb = time_best(lambda i: f32_(params, jax.random.PRNGKey(2 + i)))
        return ta, (tb - ta) / (3 * k)

    t2, m2 = marginal_of(lambda kk: make_elem_bump(apply_pool, kk))
    print(f"2. element-bump chain: {t2 / k * 1e3:8.3f} ms/bag at k={k}; marginal {m2 * 1e3:.3f} ms/bag "
          f"(bump savings vs (1): {(marginal - m2) * 1e3:.3f} ms)")

    # ---- 3. tile=2048 single-bag kernel (vmem_limit=32MB), element bump
    def pool_tile2048(params, x, mask, sex):
        b, nn, d = x.shape
        h_dim = params["trunk"]["fc2"]["w"].shape[1]
        tile = 2048
        flat = pp._pad_params(params, jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
        m3 = mask.astype(jnp.float32)[:, None, :]
        param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]

        def kernel(x_r, m_r, *rest):
            *ps, m_out, acc, stat = rest
            pp._pool_kernel_body(x_r, m_r, *ps, m_out, None, acc, stat)

        outs = pl.pallas_call(
            kernel,
            grid=(b, nn // tile),
            in_specs=[
                pl.BlockSpec((1, tile, d), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *param_specs,
            ],
            out_specs=[pl.BlockSpec((1, pp.T_PAD, h_dim), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, pp.T_PAD, h_dim), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((pp.T_PAD, h_dim), jnp.float32),
                pltpu.VMEM((2, pp.T_PAD), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        )(x, m3, *flat)
        return outs[0].sum()

    try:
        t3, m3 = marginal_of(lambda kk: make_elem_bump(pool_tile2048, kk))
        print(f"3. tile=2048 kernel  : {t3 / k * 1e3:8.3f} ms/bag at k={k}; marginal {m3 * 1e3:.3f} ms/bag "
              f"(vs (2) marginal: {m2 / m3:.3f}x)")
    except Exception as e:  # VMEM exhaustion would land here
        print(f"3. tile=2048 kernel  : FAILED: {type(e).__name__}: {str(e)[:300]}")

    flops = 2 * n * (DIM * 512 + 512 * 512 + 512 * 768)
    for name, m in [("full marginal", marginal), ("elem marginal", m2)]:
        print(f"   {name}: {flops / m / 1e12:.1f} TFLOP/s counted")


if __name__ == "__main__":
    main()
