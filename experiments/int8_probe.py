"""int8 MXU probe for the fused pooling kernel.

The bf16 kernel sits at the chip's measured dense-GEMM ceiling (~108-115
TFLOP/s, experiments/matmul_ceiling.py) — but the v5e MXU's int8 path is
rated ~2x bf16. This probe asks three questions on real hardware:

1. Does Mosaic (this jaxlib) lower `jnp.dot(int8, int8,
   preferred_element_type=int32)` inside a Pallas TPU kernel at all?
2. What does the full pooling chain achieve when the three big GEMMs
   (x@W1, h@W2, h@Wab) run int8 with dynamic per-row activation scales
   and per-column weight scales (LLM.int8-style dynamic quantization)?
3. How much of the ideal 2x survives the requantization VPU work
   (per-row abs-max, rescale, round) between GEMMs?

Variants:
- bf16:        the production math (same as mfu_probe 'full') — baseline
- int8_chain:  full chain, int8 GEMMs + dynamic requant between them,
               gates/softmax f32 — the realistic candidate
- int8_gemms:  int8 GEMM chain with NO requant math (scales folded to 1,
               wrong numerics) — upper bound separating MXU gain from VPU
               requant cost

Counted FLOPs use bench.py's formula so tflops are comparable across
probes. Run: python experiments/int8_probe.py [--batch 32 --n 8192]
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
NEG_INF = -1e30
D, H, A = 1024, 512, 384
INTERPRET = False


def _requant_rows(y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 [rows, cols] -> (int8 rows-quantized, per-row scale f32)."""
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)  # [rows, 1]
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jax.lax.round(y / scale, jax.lax.RoundingMethod.TO_NEAREST_EVEN), -127.0, 127.0)
    return q.astype(jnp.int8), scale[:, 0]


def make_kernel_int8(requant: bool):
    def body(xq_ref, sx_ref, mask_ref,
             w1_ref, sw1_ref, b1_ref, w2_ref, sw2_ref, b2_ref,
             wab_ref, swab_ref, bab_ref, wc_ref, bc_ref,
             m_out_ref, acc_ref, stat_ref):
        i = pl.program_id(1)
        n_tiles = pl.num_programs(1)

        @pl.when(i == 0)
        def _reset():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            stat_ref[0, :] = jnp.full((T_PAD,), NEG_INF, jnp.float32)
            stat_ref[1, :] = jnp.zeros((T_PAD,), jnp.float32)

        xq = xq_ref[0]  # [tile, D] int8
        sx = sx_ref[0, 0]  # [tile] f32 per-row input scales
        mask = mask_ref[0, 0]

        y1 = jnp.dot(xq, w1_ref[:], preferred_element_type=jnp.int32)  # [tile, H]
        h = jnp.maximum(
            y1.astype(jnp.float32) * (sx[:, None] * sw1_ref[:][None, :]) + b1_ref[:], 0.0
        )
        if requant:
            hq, sh = _requant_rows(h)
        else:
            hq, sh = h.astype(jnp.int8), jnp.ones_like(sx)
        y2 = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
        h2 = jnp.maximum(
            y2.astype(jnp.float32) * (sh[:, None] * sw2_ref[:][None, :]) + b2_ref[:], 0.0
        )
        if requant:
            h2q, sh2 = _requant_rows(h2)
        else:
            h2q, sh2 = h2.astype(jnp.int8), jnp.ones_like(sx)
        uv = jnp.dot(h2q, wab_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        uv = uv * (sh2[:, None] * swab_ref[:][None, :]) + bab_ref[:]
        a = jnp.tanh(uv[:, :A])
        g = jax.nn.sigmoid(uv[:, A:])
        gated = (a * g).astype(jnp.bfloat16)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]

        s_masked = jnp.where(mask[:, None] > 0, s, NEG_INF)
        m_prev = stat_ref[0, :]
        d_prev = stat_ref[1, :]
        tile_max = jnp.max(s_masked, axis=0)
        m_new = jnp.maximum(m_prev, tile_max)
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        e = jnp.exp(s_masked - m_safe[None, :]) * (mask[:, None] > 0)
        corr = jnp.exp(jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev) - m_safe)
        d_new = d_prev * corr + jnp.sum(e, axis=0)
        contrib = jax.lax.dot_general(
            e.astype(jnp.bfloat16), h2.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * corr[:, None] + contrib
        stat_ref[0, :] = m_new
        stat_ref[1, :] = d_new

        @pl.when(i == n_tiles - 1)
        def _fin():
            m_out_ref[0] = acc_ref[:] / jnp.maximum(stat_ref[1, :], 1e-30)[:, None]

    return body


def _requant_rows_bf16(y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quant math in bf16 (int8 targets <= 127 are exact in bf16's 8-bit
    mantissa): halves the VPU elementwise width vs the f32 version."""
    yf = y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(yf), axis=1, keepdims=True)
    inv = (127.0 / jnp.maximum(amax, 1e-6)).astype(jnp.bfloat16)
    q = jax.lax.round(y.astype(jnp.bfloat16) * inv, jax.lax.RoundingMethod.TO_NEAREST_EVEN)
    q = jnp.clip(q, -127.0, 127.0)
    return q.astype(jnp.int8), (amax[:, 0] / 127.0)


def make_kernel_int8_inquant(quant_bf16: bool = False, h_only: bool = False):
    """Like int8_chain but x arrives bf16 and is quantized per-row INSIDE the
    kernel — the production-realistic shape (no extra HBM pass, no int8 bag
    storage needed). quant_bf16: do the rescale/round in bf16. h_only: keep
    the x@W1 GEMM bf16 and quantize only the [tile, H] activations (half the
    quant elementwise cost, ~55% of FLOPs still int8)."""
    def body(x_ref, mask_ref,
             w1_ref, sw1_ref, b1_ref, w2_ref, sw2_ref, b2_ref,
             wab_ref, swab_ref, bab_ref, wc_ref, bc_ref,
             m_out_ref, acc_ref, stat_ref):
        i = pl.program_id(1)
        n_tiles = pl.num_programs(1)

        @pl.when(i == 0)
        def _reset():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            stat_ref[0, :] = jnp.full((T_PAD,), NEG_INF, jnp.float32)
            stat_ref[1, :] = jnp.zeros((T_PAD,), jnp.float32)

        mask = mask_ref[0, 0]
        rq = _requant_rows_bf16 if quant_bf16 else (lambda y: _requant_rows(y.astype(jnp.float32)))

        if h_only:
            # first GEMM bf16 (w1_ref is bf16 here; sw1_ref unused)
            x = x_ref[0]  # [tile, D] bf16
            h = jnp.maximum(
                jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0
            )
        else:
            xq, sx = rq(x_ref[0])
            y1 = jnp.dot(xq, w1_ref[:], preferred_element_type=jnp.int32)
            h = jnp.maximum(
                y1.astype(jnp.float32) * (sx[:, None] * sw1_ref[:][None, :]) + b1_ref[:], 0.0
            )
        hq, sh = rq(h)
        y2 = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
        h2 = jnp.maximum(
            y2.astype(jnp.float32) * (sh[:, None] * sw2_ref[:][None, :]) + b2_ref[:], 0.0
        )
        h2q, sh2 = rq(h2)
        uv = jnp.dot(h2q, wab_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        uv = uv * (sh2[:, None] * swab_ref[:][None, :]) + bab_ref[:]
        a = jnp.tanh(uv[:, :A])
        g = jax.nn.sigmoid(uv[:, A:])
        gated = (a * g).astype(jnp.bfloat16)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]

        s_masked = jnp.where(mask[:, None] > 0, s, NEG_INF)
        m_prev = stat_ref[0, :]
        d_prev = stat_ref[1, :]
        tile_max = jnp.max(s_masked, axis=0)
        m_new = jnp.maximum(m_prev, tile_max)
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        e = jnp.exp(s_masked - m_safe[None, :]) * (mask[:, None] > 0)
        corr = jnp.exp(jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev) - m_safe)
        d_new = d_prev * corr + jnp.sum(e, axis=0)
        contrib = jax.lax.dot_general(
            e.astype(jnp.bfloat16), h2.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * corr[:, None] + contrib
        stat_ref[0, :] = m_new
        stat_ref[1, :] = d_new

        @pl.when(i == n_tiles - 1)
        def _fin():
            m_out_ref[0] = acc_ref[:] / jnp.maximum(stat_ref[1, :], 1e-30)[:, None]

    return body


@functools.partial(jax.jit, static_argnames=("b", "n", "tile", "k", "quant_bf16", "h_only"))
def run_int8_inquant(qparams, key, b: int, n: int, tile: int, k: int,
                     quant_bf16: bool = False, h_only: bool = False):
    kernel = make_kernel_int8_inquant(quant_bf16, h_only)
    grid = (b, n // tile)

    def pool(x, mask):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, D), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(11)],
            ],
            out_specs=[pl.BlockSpec((1, T_PAD, H), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, T_PAD, H), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((T_PAD, H), jnp.float32), pltpu.VMEM((2, T_PAD), jnp.float32)],
            interpret=INTERPRET,
        )(x, mask, *qparams)[0]

    x = jax.random.normal(key, (b, n, D), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.ones((b, 1, n), jnp.float32)

    def bodyf(_, carry):
        xx, acc = carry
        m = pool(xx, mask)
        bump = (m.sum() * 1e-12).astype(jnp.bfloat16)
        return (xx + bump, acc + m.sum())

    _, acc = jax.lax.fori_loop(0, k, bodyf, (x, jnp.float32(0)))
    return acc


def make_kernel_bf16():
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
        uv = jnp.dot(h, wab_ref[:], preferred_element_type=jnp.float32) + bab_ref[:]
        a = jnp.tanh(uv[:, :A])
        g = jax.nn.sigmoid(uv[:, A:])
        gated = (a * g).astype(x.dtype)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]
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
        def _fin():
            m_out_ref[0] = acc_ref[:] / jnp.maximum(stat_ref[1, :], 1e-30)[:, None]

    return body


@functools.partial(jax.jit, static_argnames=("b", "n", "tile", "k", "requant"))
def run_int8(qparams, key, b: int, n: int, tile: int, k: int, requant: bool):
    kernel = make_kernel_int8(requant)
    grid = (b, n // tile)

    def pool(xq, sx, mask):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, D), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(11)],
            ],
            out_specs=[pl.BlockSpec((1, T_PAD, H), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, T_PAD, H), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((T_PAD, H), jnp.float32), pltpu.VMEM((2, T_PAD), jnp.float32)],
            interpret=INTERPRET,
        )(xq, sx, mask, *qparams)[0]

    x = jax.random.normal(key, (b, n, D), jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=2), 1e-6)  # [b, n]
    sx = (amax / 127.0)[:, None, :]  # [b, 1, n]
    xq = jnp.clip(jnp.round(x / (amax[:, :, None] / 127.0)), -127, 127).astype(jnp.int8)
    mask = jnp.ones((b, 1, n), jnp.float32)

    def bodyf(_, carry):
        xx, acc = carry
        m = pool(xx, sx, mask)
        bump = (m.sum() * 1e-9 >= 1e30).astype(jnp.int8)  # always 0; keeps serial dep
        return (xx + bump, acc + m.sum())

    _, acc = jax.lax.fori_loop(0, k, bodyf, (xq, jnp.float32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("b", "n", "tile", "k"))
def run_bf16(params, key, b: int, n: int, tile: int, k: int):
    kernel = make_kernel_bf16()
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--variants", type=str, default="bf16,int8_chain,int8_inquant,int8_gemms")
    args = ap.parse_args()
    global INTERPRET
    INTERPRET = args.interpret

    rng = np.random.RandomState(0)
    w1f = rng.randn(D, H).astype(np.float32) * 0.03
    w2f = rng.randn(H, H).astype(np.float32) * 0.04
    wabf = rng.randn(H, 2 * A).astype(np.float32) * 0.04
    wcf = np.pad(rng.randn(A, 2).astype(np.float32) * 0.05, ((0, 0), (0, T_PAD - 2)))

    def qcols(w):  # per-output-column int8 quant
        s = np.maximum(np.abs(w).max(axis=0), 1e-6) / 127.0
        return jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8), jnp.asarray(s, jnp.float32)

    w1q, sw1 = qcols(w1f)
    w2q, sw2 = qcols(w2f)
    wabq, swab = qcols(wabf)
    zeros = lambda c: jnp.zeros((c,), jnp.float32)
    qparams = (w1q, sw1, zeros(H), w2q, sw2, zeros(H),
               wabq, swab, zeros(2 * A), jnp.asarray(wcf, jnp.bfloat16), zeros(T_PAD))
    params = (jnp.asarray(w1f, jnp.bfloat16), zeros(H), jnp.asarray(w2f, jnp.bfloat16), zeros(H),
              jnp.asarray(wabf, jnp.bfloat16), zeros(2 * A), jnp.asarray(wcf, jnp.bfloat16), zeros(T_PAD))

    counted = 2 * args.batch * args.n * (D * H + H * H + 2 * H * A) * args.k

    for variant in args.variants.split(","):
        try:
            if variant == "bf16":
                f = lambda i: float(run_bf16(params, jax.random.PRNGKey(7 + i), args.batch, args.n, args.tile, args.k))
            elif variant == "int8_chain":
                f = lambda i: float(run_int8(qparams, jax.random.PRNGKey(7 + i), args.batch, args.n, args.tile, args.k, True))
            elif variant == "int8_inquant":
                f = lambda i: float(run_int8_inquant(qparams, jax.random.PRNGKey(7 + i), args.batch, args.n, args.tile, args.k))
            elif variant == "int8_inquant_bf16":
                f = lambda i: float(run_int8_inquant(qparams, jax.random.PRNGKey(7 + i), args.batch, args.n, args.tile, args.k, quant_bf16=True))
            elif variant == "int8_h_only":
                hparams = (jnp.asarray(w1f, jnp.bfloat16), sw1, zeros(H), w2q, sw2, zeros(H),
                           wabq, swab, zeros(2 * A), jnp.asarray(wcf, jnp.bfloat16), zeros(T_PAD))
                f = lambda i: float(run_int8_inquant(hparams, jax.random.PRNGKey(7 + i), args.batch, args.n, args.tile, args.k, quant_bf16=True, h_only=True))
            else:
                f = lambda i: float(run_int8(qparams, jax.random.PRNGKey(7 + i), args.batch, args.n, args.tile, args.k, False))
            f(-1)
            times = []
            for i in range(args.runs):
                t0 = time.perf_counter()
                f(i)
                times.append(time.perf_counter() - t0)
            t = min(times)
            print(json.dumps({
                "variant": variant,
                "tflops_counted": round(counted / t / 1e12, 1),
                "ms_per_call": round(t / args.k * 1e3, 3),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            print(json.dumps({"variant": variant, "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)


if __name__ == "__main__":
    main()
