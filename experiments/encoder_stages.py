"""Per-stage timing of the truncated ResNet-50 encoder on the real chip —
find where the 9.5k patches/s plateau lives and whether it is at the
hardware conv ceiling.

Suspicion to test: the 7x7/2 stem on 3 input channels is the classic TPU
conv weak spot (3/128 lanes busy on the input dim; MLPerf-era fix is a
space-to-depth rewrite). Times each stage with the bench.py discipline
(device-generated inputs, serial-dependency fori_loop chains, scalar
fetch), plus a canonical high-channel 3x3 conv as the achievable ceiling.

Run: python experiments/encoder_stages.py [--batch 128 --k 16]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

from toad_tpu.config import EncoderConfig
from toad_tpu.models.resnet_encoder import (
    ResNetEncoder,
    _bottleneck,
    _conv,
    _max_pool_3x3_s2,
    apply_folded,
    fold_bn,
)


def conv_flops(out_h, out_w, cout, kh, kw, cin):
    return 2 * out_h * out_w * cout * kh * kw * cin


def stage_fns(cfg: EncoderConfig, params):
    """(name, fn(x)->y, input_shape, flops_per_image) per pipeline stage."""
    dt = jnp.dtype(cfg.compute_dtype)

    def stem(x):
        x = _conv(x.astype(dt), params["stem"]["conv"], stride=2, padding=3, dt=dt, bias=params["stem"]["bias"])
        return _max_pool_3x3_s2(jax.nn.relu(x))

    def mk_layer(s):
        stage = params[f"layer{s + 1}"]
        stride = 1 if s == 0 else 2

        def f(x):
            for b in range(cfg.blocks[s]):
                x = _bottleneck(x, stage[b], stride if b == 0 else 1, cfg.bn_eps, dt)
            return x

        return f

    # shapes for 256x256 input
    widths = (64, 128, 256)
    spatial_in = (64, 64, 32)  # layer inputs after stem+pool
    spatial_out = (64, 32, 16)
    cins = (64, 256, 512)
    couts = (256, 512, 1024)

    stem_fl = conv_flops(128, 128, 64, 7, 7, 3)
    out = [("stem+pool", stem, (256, 256, 3), stem_fl)]
    for s in range(3):
        w, so, ci, co = widths[s], spatial_out[s], cins[s], couts[s]
        # exact per-block accounting (torchvision v1: stride on conv2)
        fl = 0
        for b in range(cfg.blocks[s]):
            cin_b = ci if b == 0 else co
            s_in = spatial_in[s] if b == 0 else spatial_out[s]
            fl += conv_flops(s_in, s_in, w, 1, 1, cin_b)            # conv1 1x1 (full-res in)
            fl += conv_flops(so, so, w, 3, 3, w)                    # conv2 3x3 (stride here)
            fl += conv_flops(so, so, co, 1, 1, w)                   # conv3 1x1
            if b == 0:
                fl += conv_flops(so, so, co, 1, 1, cin_b)           # downsample
        out.append((f"layer{s + 1}", mk_layer(s), (spatial_in[s], spatial_in[s], cins[s]), fl))
    return out


def time_chain(fn, in_shape, b, k, runs=3):
    @functools.partial(jax.jit, static_argnames=())
    def chain(key):
        x = jax.random.normal(key, (b, *in_shape), jnp.float32).astype(jnp.bfloat16)

        def body(_, carry):
            xx, acc = carry
            y = fn(xx)
            bump = (y.sum() * 1e-12).astype(jnp.bfloat16)
            return (xx + bump, acc + y.sum().astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    f = lambda i: float(chain(jax.random.PRNGKey(7 + i)))
    f(-1)
    ts = []
    for i in range(runs):
        t0 = time.perf_counter()
        f(i)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()
    b, k = args.batch, args.k

    cfg = EncoderConfig()
    enc = ResNetEncoder(cfg)
    params = fold_bn(enc.init(jax.random.PRNGKey(0)), cfg)

    total_fl = 0.0
    total_t = 0.0
    for name, fn, in_shape, fl in stage_fns(cfg, params):
        t = time_chain(fn, in_shape, b, k)
        tf = fl * b * k / t / 1e12
        total_fl += fl
        total_t += t
        print(json.dumps({"stage": name, "tflops": round(tf, 1),
                          "ms_per_batch": round(t / k * 1e3, 2),
                          "gflop_per_img": round(fl / 1e9, 2)}), flush=True)

    # full encoder end-to-end
    t = time_chain(lambda x: apply_folded(cfg, params, x), (256, 256, 3), b, k)
    print(json.dumps({"stage": "full", "tflops": round(total_fl * b * k / t / 1e12, 1),
                      "ms_per_batch": round(t / k * 1e3, 2),
                      "patches_per_sec": round(b * k / t, 1)}), flush=True)

    # achievable conv ceiling: high-channel 3x3 at layer3-like shape
    wkey = jax.random.PRNGKey(1)
    wconv = (jax.random.normal(wkey, (3, 3, 256, 256), jnp.float32) * 0.02).astype(jnp.bfloat16)
    ceil_fn = lambda x: _conv(x, wconv, stride=1, padding=1, dt=jnp.bfloat16)
    t = time_chain(ceil_fn, (16, 16, 256), b * 8, k * 4)
    fl = conv_flops(16, 16, 256, 3, 3, 256)
    print(json.dumps({"stage": "conv_ceiling_3x3_256ch_16px", "tflops": round(fl * b * 8 * k * 4 / t / 1e12, 1)}), flush=True)
    wconv2 = (jax.random.normal(wkey, (3, 3, 128, 128), jnp.float32) * 0.02).astype(jnp.bfloat16)
    ceil2 = lambda x: _conv(x, wconv2, stride=1, padding=1, dt=jnp.bfloat16)
    t = time_chain(ceil2, (64, 64, 128), b, k * 4)
    fl = conv_flops(64, 64, 128, 3, 3, 128)
    print(json.dumps({"stage": "conv_ceiling_3x3_128ch_64px", "tflops": round(fl * b * k * 4 / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
