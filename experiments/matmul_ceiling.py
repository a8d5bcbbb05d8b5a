"""Measure this chip's ACHIEVABLE bf16 matmul ceiling — the honest MFU
denominator for the pooling-kernel roofline in BASELINE.md.

The v5e public spec is ~197 TFLOP/s bf16, but no real kernel reaches spec:
the achievable ceiling for a given (M, K, N) depends on MXU tiling, VMEM
residency, and (here) whatever the shared tenant environment costs. This
probe times canonical dense matmuls with the same discipline as bench.py /
experiments/mfu_probe.py: device-generated inputs, K serially-dependent
calls inside one jitted fori_loop (a tiny data-dependent "bump" of the
input defeats CSE without perturbing timing), scalar fetch at the end.

Shapes:
- big squares (4096^3, 8192^3)            -> best-case chip ceiling
- the pooling kernel's own per-step GEMMs  -> shape-specific ceiling:
  trunk1 [tile,1024]@[1024,512], trunk2 [tile,512]@[512,512],
  gate    [tile,512]@[512,768]
  (tile = 1024 rows, and 2048 = the b2 merged variant)

Run on a quiet TPU: python experiments/matmul_ceiling.py
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("m", "kk", "n", "k"))
def chain(w, key, m: int, kk: int, n: int, k: int):
    x = jax.random.normal(key, (m, kk), jnp.float32).astype(jnp.bfloat16)

    def body(_, carry):
        xx, acc = carry
        y = jnp.dot(xx, w, preferred_element_type=jnp.float32)
        bump = (y.sum() * 1e-12).astype(jnp.bfloat16)
        return (xx + bump, acc + y.sum())

    _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64, help="chained calls per timing")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    shapes = [
        ("square4096", 4096, 4096, 4096),
        ("square8192", 8192, 8192, 8192),
        ("trunk1_t1024", 1024, 1024, 512),
        ("trunk2_t1024", 1024, 512, 512),
        ("gate_t1024", 1024, 512, 768),
        ("trunk1_t2048", 2048, 1024, 512),
        ("trunk2_t2048", 2048, 512, 512),
        ("trunk1_t8192", 8192, 1024, 512),
    ]
    peak = 197.0
    for name, m, kk, n in shapes:
        w = (jax.random.normal(jax.random.PRNGKey(0), (kk, n), jnp.float32) * 0.02).astype(jnp.bfloat16)
        k = args.k if m <= 4096 else max(8, args.k // 8)
        f = lambda i: float(chain(w, jax.random.PRNGKey(7 + i), m, kk, n, k))
        f(-1)
        times = []
        for i in range(args.runs):
            t0 = time.perf_counter()
            f(i)
            times.append(time.perf_counter() - t0)
        t = min(times)
        tf = 2 * m * kk * n * k / t / 1e12
        print(json.dumps({
            "shape": name, "mkn": [m, kk, n],
            "tflops": round(tf, 1), "pct_peak": round(100 * tf / peak, 1),
            "us_per_call": round(t / k * 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
