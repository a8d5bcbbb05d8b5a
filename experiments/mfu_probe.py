"""MFU probe for the fused pooling kernel (VERDICT r1 weak #4).

The judged bench measures ~108 TFLOP/s of counted matmul FLOPs at
8192x1024 bf16 — ~55% of the v5e's ~197 TFLOP/s bf16 peak. The workload is
compute-bound (arithmetic intensity ~1.1 kFLOP/byte), so the gap is inside
the kernel. This probe times ablated kernel variants to attribute it:

- full:      the production math (trunk -> gate -> online softmax pool)
- fusedab:   Wa|Wb fused into one [H, 2*384] matmul, then split
- exp2:      tanh/sigmoid rewritten via exp (hardware EUP) instead of the
             default polynomial lowerings
- nogate:    transcendentals removed (matmuls kept) -> VPU-cost ceiling
- nosoftmax: gate kept, online-softmax update replaced by plain accumulate
             -> softmax-bookkeeping cost
- trunkonly: just the two trunk matmuls + accumulate -> MXU ceiling for
             this data movement pattern
- xla:       same math scheduled by XLA (h round-trips HBM) -> Mosaic vs XLA
- b2:        two bags per grid step, rows merged into one [2*tile, D] matmul
             chain -> amortizes per-grid-step overhead

Timing uses the bench.py discipline: inputs device-generated, K serially-
dependent kernel calls in one jitted fori_loop, scalar fetch at the end.

Run: python experiments/mfu_probe.py [--batch 32 --n 8192 --k 24]
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_PAD = 8
INTERPRET = False  # set by --interpret for CPU correctness checks
NEG_INF = -1e30
D, H, A = 1024, 512, 384


def make_kernel(variant: str):
    def body(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref, wab_ref, bab_ref,
             wc_ref, bc_ref, m_out_ref, acc_ref, stat_ref):
        i = pl.program_id(1)
        n_tiles = pl.num_programs(1)

        @pl.when(i == 0)
        def _reset():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            stat_ref[0, :] = jnp.full((T_PAD,), NEG_INF, jnp.float32)
            stat_ref[1, :] = jnp.zeros((T_PAD,), jnp.float32)

        x = x_ref[0]
        mask = mask_ref[0, 0]
        h = jnp.maximum(jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0).astype(x.dtype)
        h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:], 0.0).astype(x.dtype)

        if variant == "trunkonly":
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                jnp.ones((T_PAD, x.shape[0]), x.dtype), h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            stat_ref[1, :] = stat_ref[1, :] + 1.0

            @pl.when(i == n_tiles - 1)
            def _fin0():
                m_out_ref[0] = acc_ref[:] / stat_ref[1, :][:, None]
            return

        uv = jnp.dot(h, wab_ref[:], preferred_element_type=jnp.float32) + bab_ref[:]  # [tile, 2A]
        u, v = uv[:, :A], uv[:, A:]
        if variant == "nogate":
            a = u * 0.125
            g = v * 0.125 + 0.5
        elif variant == "exp2":
            # tanh(u) = 1 - 2/(e^{2u}+1); sigmoid(v) = 1/(1+e^{-v})
            a = 1.0 - 2.0 / (jnp.exp(2.0 * u) + 1.0)
            g = 1.0 / (1.0 + jnp.exp(-v))
        else:  # full / fusedab / nosoftmax
            a = jnp.tanh(u)
            g = jax.nn.sigmoid(v)
        gated = (a * g).astype(x.dtype)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]

        if variant == "nosoftmax":
            e = jnp.minimum(s, 1.0) * (mask[:, None] > 0)
            contrib = jax.lax.dot_general(e.astype(x.dtype), h, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] + contrib
            stat_ref[1, :] = stat_ref[1, :] + jnp.sum(e, axis=0)

            @pl.when(i == n_tiles - 1)
            def _fin1():
                m_out_ref[0] = acc_ref[:] / jnp.maximum(stat_ref[1, :], 1e-30)[:, None]
            return

        s_masked = jnp.where(mask[:, None] > 0, s, NEG_INF)
        m_prev = stat_ref[0, :]
        d_prev = stat_ref[1, :]
        tile_max = jnp.max(s_masked, axis=0)
        m_new = jnp.maximum(m_prev, tile_max)
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        e = jnp.exp(s_masked - m_safe[None, :]) * (mask[:, None] > 0)
        corr = jnp.exp(jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev) - m_safe)
        d_new = d_prev * corr + jnp.sum(e, axis=0)
        contrib = jax.lax.dot_general(e.astype(x.dtype), h, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * corr[:, None] + contrib
        stat_ref[0, :] = m_new
        stat_ref[1, :] = d_new

        @pl.when(i == n_tiles - 1)
        def _fin2():
            m_out_ref[0] = acc_ref[:] / jnp.maximum(stat_ref[1, :], 1e-30)[:, None]

    return body


@functools.partial(jax.jit, static_argnames=("variant", "b", "n", "tile", "k"))
def run_chain(params, key, variant: str, b: int, n: int, tile: int, k: int):
    kernel = make_kernel(variant)
    grid = (b, n // tile)

    def pool(x, mask):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, D), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
            ],
            out_specs=[pl.BlockSpec((1, T_PAD, H), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, T_PAD, H), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((T_PAD, H), jnp.float32), pltpu.VMEM((2, T_PAD), jnp.float32)],
            interpret=INTERPRET,
        )(x, mask, *params)[0]

    x = jax.random.normal(key, (b, n, D), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.ones((b, 1, n), jnp.float32)

    def bodyf(_, carry):
        xx, acc = carry
        m = pool(xx, mask)
        bump = (m.sum() * 1e-12).astype(jnp.bfloat16)
        return (xx + bump, acc + m.sum())

    _, acc = jax.lax.fori_loop(0, k, bodyf, (x, jnp.float32(0)))
    return acc


def make_kernel_b2():
    """Two bags per grid step: merge both bags' rows into one [2*tile, D]
    matmul chain (amortizes per-grid-step Mosaic overhead and doubles MXU
    M-dim), then split back for per-bag online-softmax bookkeeping."""

    def body(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref, wab_ref, bab_ref,
             wc_ref, bc_ref, m_out_ref, acc_ref, stat_ref):
        i = pl.program_id(1)
        n_tiles = pl.num_programs(1)

        @pl.when(i == 0)
        def _reset():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            stat_ref[:, 0, :] = jnp.full((2, T_PAD), NEG_INF, jnp.float32)
            stat_ref[:, 1, :] = jnp.zeros((2, T_PAD), jnp.float32)

        x2 = x_ref[:]  # [2, tile, D]
        tile = x2.shape[1]
        xm = x2.reshape(2 * tile, D)
        mask = mask_ref[:, 0, :]  # [2, tile]

        h = jnp.maximum(jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0).astype(xm.dtype)
        h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:], 0.0).astype(xm.dtype)
        uv = jnp.dot(h, wab_ref[:], preferred_element_type=jnp.float32) + bab_ref[:]
        a = jnp.tanh(uv[:, :A])
        g = jax.nn.sigmoid(uv[:, A:])
        gated = (a * g).astype(xm.dtype)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]  # [2*tile, T_PAD]

        s3 = s.reshape(2, tile, T_PAD)
        h3 = h.reshape(2, tile, -1)
        s_masked = jnp.where(mask[:, :, None] > 0, s3, NEG_INF)  # [2, tile, T_PAD]

        m_prev = stat_ref[:, 0, :]  # [2, T_PAD]
        d_prev = stat_ref[:, 1, :]
        tile_max = jnp.max(s_masked, axis=1)  # [2, T_PAD]
        m_new = jnp.maximum(m_prev, tile_max)
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        e = jnp.exp(s_masked - m_safe[:, None, :]) * (mask[:, :, None] > 0)
        corr = jnp.exp(jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev) - m_safe)  # [2, T_PAD]
        d_new = d_prev * corr + jnp.sum(e, axis=1)
        contrib = jax.lax.dot_general(
            e.astype(xm.dtype), h3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [2, T_PAD, H]
        acc_ref[:] = acc_ref[:] * corr[:, :, None] + contrib
        stat_ref[:, 0, :] = m_new
        stat_ref[:, 1, :] = d_new

        @pl.when(i == n_tiles - 1)
        def _fin():
            m_out_ref[:] = acc_ref[:] / jnp.maximum(stat_ref[:, 1, :], 1e-30)[:, :, None]

    return body


@functools.partial(jax.jit, static_argnames=("b", "n", "tile", "k"))
def run_chain_b2(params, key, b: int, n: int, tile: int, k: int):
    kernel = make_kernel_b2()
    grid = (b // 2, n // tile)

    def pool(x, mask):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((2, tile, D), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
            ],
            out_specs=[pl.BlockSpec((2, T_PAD, H), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, T_PAD, H), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((2, T_PAD, H), jnp.float32), pltpu.VMEM((2, 2, T_PAD), jnp.float32)],
            interpret=INTERPRET,
        )(x, mask, *params)[0]

    x = jax.random.normal(key, (b, n, D), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.ones((b, 1, n), jnp.float32)

    def bodyf(_, carry):
        xx, acc = carry
        m = pool(xx, mask)
        bump = (m.sum() * 1e-12).astype(jnp.bfloat16)
        return (xx + bump, acc + m.sum())

    _, acc = jax.lax.fori_loop(0, k, bodyf, (x, jnp.float32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("b", "n", "k"))
def run_chain_xla(params, key, b: int, n: int, k: int):
    """Same math scheduled by XLA instead of the Pallas kernel — separates
    Mosaic-specific overhead from what the chip gives this shape at all."""
    w1, b1, w2, b2, wab, bab, wc, bc = params
    A_ = wab.shape[1] // 2

    def pool(x, mask):
        h = jnp.maximum(jnp.einsum("bnd,dh->bnh", x, w1, preferred_element_type=jnp.float32) + b1, 0.0).astype(x.dtype)
        h = jnp.maximum(jnp.einsum("bnh,hk->bnk", h, w2, preferred_element_type=jnp.float32) + b2, 0.0).astype(x.dtype)
        uv = jnp.einsum("bnh,ha->bna", h, wab, preferred_element_type=jnp.float32) + bab
        gated = (jnp.tanh(uv[:, :, :A_]) * jax.nn.sigmoid(uv[:, :, A_:])).astype(x.dtype)
        s = jnp.einsum("bna,at->bnt", gated, wc, preferred_element_type=jnp.float32) + bc
        s = jnp.where(mask[:, :, None] > 0, s, NEG_INF)
        w = jax.nn.softmax(s, axis=1)  # [B, N, T]
        return jnp.einsum("bnt,bnh->bth", w.astype(x.dtype), h, preferred_element_type=jnp.float32)

    x = jax.random.normal(key, (b, n, D), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.ones((b, n), jnp.float32)

    def bodyf(_, carry):
        xx, acc = carry
        m = pool(xx, mask)
        bump = (m.sum() * 1e-12).astype(jnp.bfloat16)
        return (xx + bump, acc + m.sum())

    _, acc = jax.lax.fori_loop(0, k, bodyf, (x, jnp.float32(0)))
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--interpret", action="store_true", help="Pallas interpret mode (CPU correctness check)")
    ap.add_argument("--variants", type=str,
                    default="full,fusedab,exp2,nogate,nosoftmax,trunkonly,xla,b2")
    args = ap.parse_args()
    global INTERPRET
    INTERPRET = args.interpret

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    w1 = jnp.asarray(rng.randn(D, H) * 0.03, dt)
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jnp.asarray(rng.randn(H, H) * 0.04, dt)
    b2 = jnp.zeros((H,), jnp.float32)
    wab = jnp.asarray(rng.randn(H, 2 * A) * 0.04, dt)
    bab = jnp.zeros((2 * A,), jnp.float32)
    wc = jnp.asarray(np.pad(rng.randn(A, 2) * 0.05, ((0, 0), (0, T_PAD - 2))), dt)
    bc = jnp.zeros((T_PAD,), jnp.float32)
    params = (w1, b1, w2, b2, wab, bab, wc, bc)

    # counted FLOPs use the SAME formula as bench.py for comparability
    counted = 2 * args.batch * args.n * (D * H + H * H + 2 * H * A) * args.k
    peak = 197.0  # v5e bf16 TFLOP/s (public spec ~197)

    for variant in args.variants.split(","):
        if variant == "xla":
            f = lambda i: float(run_chain_xla(params, jax.random.PRNGKey(7 + i),
                                              args.batch, args.n, args.k))
        elif variant == "b2":
            f = lambda i: float(run_chain_b2(params, jax.random.PRNGKey(7 + i),
                                             args.batch, args.n, args.tile, args.k))
        else:
            f = lambda i: float(run_chain(params, jax.random.PRNGKey(7 + i), variant,
                                          args.batch, args.n, args.tile, args.k))
        f(-1)  # compile
        times = []
        for i in range(args.runs):
            t0 = time.perf_counter()
            f(i)
            times.append(time.perf_counter() - t0)
        t = min(times)
        tf = counted / t / 1e12
        print(json.dumps({
            "variant": variant,
            "tflops_counted": round(tf, 1),
            "pct_peak": round(100 * tf / peak, 1),
            "ms_per_call": round(t / args.k * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
