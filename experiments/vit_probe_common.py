"""Shared harness for the ViT-L decomposition probes.

Every ViT probe measures the same way: build a full ViT forward with one
piece swapped out, run it through a serial-dependency `fori_loop` chain so
the relay's H2D variance and dispatch gaps can't hide in the timing (see
CLAUDE.md "never benchmark with host-generated inputs"), and take the best
of a few runs after a warm-up. Only the per-block math differs per probe,
so that is the pluggable part.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from toad_tpu.models.vit_encoder import _layer_norm


def serial_time(fn, *args, runs: int = 3) -> float:
    """Best-of-`runs` wall time of `float(fn(*args))` after one warm-up call.

    The scalar fetch forces completion; callers pass a chained fn whose
    result depends on every step.
    """
    float(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def tile_chain(step, n_tiles: int, hw: int, k: int):
    """Jitted serial chain: device-generated bf16 tiles, `k` dependent
    forward passes (each perturbs the input by a negligible epsilon of the
    previous output so XLA cannot parallelize or elide them), scalar out."""

    @jax.jit
    def fn(params, key):
        tiles = jax.random.uniform(key, (n_tiles, hw, hw, 3), jnp.float32).astype(jnp.bfloat16)

        def body(_, carry):
            t, acc = carry
            out = step(params, t)
            return (t + (out.sum() * 1e-12).astype(jnp.bfloat16), acc + out.sum())

        _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.float32(0)))
        return acc

    return fn


def make_vit_fwd(cfg, enc, block_fn, final_norm=None):
    """Full ViT forward with a pluggable per-block function.

    `block_fn(tokens, blk_params, dtype) -> tokens` carries the variant under
    test; everything around it (preprocess, patch embed, cls/pos tokens, the
    final norm on the cls token) is the production dataflow.
    """
    cfg_dt = jnp.dtype(cfg.compute_dtype)

    def norm_final(x, p):
        if final_norm is not None:
            return final_norm(x, p)
        return _layer_norm(x, p, cfg.ln_eps)

    def fwd(params, tiles):
        dt = cfg_dt
        x = enc.preprocess(tiles)
        s = cfg.patch_size
        toks = jax.lax.conv_general_dilated(
            x.astype(dt), params["patch_embed"]["w"].astype(dt), (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dt,
        ).reshape(tiles.shape[0], -1, cfg.width) + params["patch_embed"]["b"].astype(dt)
        cls = jnp.broadcast_to(params["cls_token"].astype(dt), (tiles.shape[0], 1, cfg.width))
        toks = jnp.concatenate([cls, toks], 1) + params["pos_embed"].astype(dt)
        for blk in params["blocks"]:
            toks = block_fn(toks, blk, dt)
        return norm_final(toks[:, 0, :], params["norm"]).astype(jnp.float32)

    return fwd
