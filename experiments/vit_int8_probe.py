"""Is int8 worth it for the ViT-L encoder's GEMMs? (VERDICT r2 next #2)

The ruled-out ledger covers int8 *convs* (1.10-1.18x — ResNet shapes). ViT-L
is GEMM-dominated, where the pooling stack measured 1.45x. This probe prices
int8 at the ViT-L block shapes (M=128 tiles x 197 tokens = 25216 rows):

  qkv:  [25216, 1024] @ [1024, 3072]
  proj: [25216, 1024] @ [1024, 1024]
  fc1:  [25216, 1024] @ [1024, 4096]
  fc2:  [25216, 4096] @ [4096, 1024]

Variants (serial-dependency chain, scalar fetch — CLAUDE.md methodology):
  A. bf16 chain of the 4 GEMMs (the production datapath)
  B. int8 x int8 -> int32 chain with per-row activation quantization +
     per-column weight scales + dequant epilogue INCLUDED (what a real int8
     block would pay: ops/quantize.py scheme)
  C. int8 GEMMs only (no quantize/dequant epilogues): the upper bound

Run: python -c "import runpy; runpy.run_path('experiments/vit_int8_probe.py', run_name='__main__')"
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

M = 128 * 197
SHAPES = [(1024, 3072), (1024, 1024), (1024, 4096), (4096, 1024)]
K_CHAIN = 8


def _time(fn, *args, runs=3):
    float(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _gflops_chain():
    return 2 * M * sum(k * n for k, n in SHAPES) * K_CHAIN / 1e9


def quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def main():
    key = jax.random.PRNGKey(0)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (k, n), jnp.float32) * 0.02
          for i, (k, n) in enumerate(SHAPES)]
    ws_bf16 = [w.astype(jnp.bfloat16) for w in ws]
    wqs, wss = [], []
    for w in ws:
        amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        wqs.append(jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8))
        wss.append(s)

    @jax.jit
    def chain_bf16(ws, key):
        x = jax.random.normal(key, (M, 1024), jnp.float32).astype(jnp.bfloat16)

        def body(_, x):
            h = x
            for w in ws:
                h = jax.lax.dot_general(h[:, : w.shape[0]], w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.bfloat16)
                h = jnp.tanh(h) * 0.1  # keep magnitudes bounded through the chain
            return h[:, :1024] + x * 1e-6

        return jax.lax.fori_loop(0, K_CHAIN, body, x).sum()

    @jax.jit
    def chain_int8(wqs, wss, key):
        x = jax.random.normal(key, (M, 1024), jnp.float32)

        def body(_, x):
            h = x
            for wq, ws_ in zip(wqs, wss):
                hq, hs = quant_rows(h[:, : wq.shape[0]])
                y = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                h = y.astype(jnp.float32) * hs * ws_
                h = jnp.tanh(h) * 0.1
            return h[:, :1024] + x * 1e-6

        return jax.lax.fori_loop(0, K_CHAIN, body, x).sum()

    @jax.jit
    def chain_int8_raw(wqs, key):
        bits = jax.random.randint(key, (M, 1024), -127, 128, jnp.int32)
        x = bits.astype(jnp.int8)

        def body(i, x):
            h = x
            for wq in wqs:
                y = jax.lax.dot_general(h[:, : wq.shape[0]], wq, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                h = (y >> 8).astype(jnp.int8)  # cheap requant stand-in, keeps serial dep
            return h[:, :1024] + (x * 0).at[0, 0].add(i % 2).astype(jnp.int8)

        return jax.lax.fori_loop(0, K_CHAIN, body, x).sum()

    g = _gflops_chain()
    t = _time(chain_bf16, ws_bf16, jax.random.PRNGKey(1))
    print(f"A_bf16: {t * 1e3:.1f} ms  {g / t / 1e3:.1f} TFLOP/s", flush=True)
    t8 = _time(chain_int8, wqs, wss, jax.random.PRNGKey(1))
    print(f"B_int8_full: {t8 * 1e3:.1f} ms  {g / t8 / 1e3:.1f} TFLOP/s  ({t / t8:.2f}x bf16)", flush=True)
    t8r = _time(chain_int8_raw, wqs, jax.random.PRNGKey(1))
    print(f"C_int8_raw: {t8r * 1e3:.1f} ms  {g / t8r / 1e3:.1f} TFLOP/s  ({t / t8r:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
