"""Round-4: settle the ResNet encoder batch-size claim (VERDICT r3 next #7).

CLAUDE.md's ledger says B=256-512 is +4-6% over B=128 with a ~9.5k patches/s
plateau; bench.py moved to B=256 on that claim, then r3 measured 8,576 —
BELOW r2's B=128 number. Tenancy drift is plausible but unverified. This
probe interleaves B=128/256/512 within one process, several reps, so drift
cannot favor one arm. Chain length scales inversely with B so each timed
call does the same total patch count.

Run on the real chip: python experiments/encoder_batch_ab.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
import jax
import jax.numpy as jnp

from experiments.vit_probe_common import serial_time
from toad_tpu.config import EncoderConfig
from toad_tpu.models.resnet_encoder import ResNetEncoder, apply_folded, fold_bn

HW = 256
TOTAL = 1536  # patches per timed call, divisible by all batch sizes


def make_fn(cfg, b: int):
    k = TOTAL // b

    @jax.jit
    def fn(params, key):
        tiles = jax.random.uniform(key, (b, HW, HW, 3), jnp.float32).astype(jnp.bfloat16)

        def body(_, carry):
            t, acc = carry
            feats = apply_folded(cfg, params, t)
            return (t + (acc * 1e-12).astype(jnp.bfloat16), acc + feats.sum())

        _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.float32(0)))
        return acc

    return fn


def main():
    cfg = EncoderConfig()
    params = fold_bn(ResNetEncoder(cfg).init(jax.random.PRNGKey(0)), cfg)
    batches = (128, 256, 512)
    fns = {b: make_fn(cfg, b) for b in batches}
    # compile all three first so reps only time steady-state execution
    for b in batches:
        float(fns[b](params, jax.random.PRNGKey(0)))
        print(f"compiled B={b}", flush=True)
    for rep in range(3):
        out = []
        for b in batches:
            t = serial_time(fns[b], params, jax.random.PRNGKey(1 + rep), runs=2)
            out.append(f"B={b}: {TOTAL / t:.0f} p/s")
        print(f"rep{rep}: " + "  ".join(out), flush=True)


if __name__ == "__main__":
    main()
