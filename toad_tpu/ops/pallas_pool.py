"""Pallas TPU kernel: fused trunk + gated attention + online masked-softmax
pooling over padded bags.

Covers the whole per-bag pipeline of the reference forward
(``models/model_toad.py:90-99``) in one kernel pass per bag:

    for each N-tile of the bag (streamed through VMEM):
        h  = relu(x @ W1 + b1); h = relu(h @ W2 + b2)        # MXU
        s  = tanh(h@Wa+ba) * sigmoid(h@Wb+bb) @ Wc + bc      # [tile, T]
        online-softmax update of (max, denom, acc += e^T @ h) per task

The online (flash-style) rescaling makes the masked softmax exact while the
``[N, H]`` trunk activations never round-trip to HBM — the kernel reads
``N*D`` input bytes and writes only the ``[T, H]`` pooled vectors plus the
``[T, N]`` raw scores (needed for attention heatmaps / A_raw parity).

Grid is (B, N/TILE): TPU Pallas iterates the grid sequentially with the last
axis fastest, so VMEM scratch accumulators carry state across a bag's tiles
and reset at tile 0. On the classification fast path (no score output) with
an even batch, the grid is (B/2, N/TILE) and two bags' rows merge into one
[2*TILE, D] matmul chain per step (+3.3% measured — the MXU M-dim doubles
and per-step overhead halves; see ``_pool_kernel_body_pair``). The int8
variants mirror both shapes (``_pool_kernel_body_int8{,_pair}``) with
int8 x int8 -> int32 MXU GEMMs and in-kernel per-row requantization.

In classification mode every body also gates its tile work with
``pl.when(sum(mask) > 0)``: the online update is the identity on an
all-masked tile, so the pure-padding tiles a pow2 bucket leaves behind
(up to ~40% of the grid for a bag at bucket/2+1) cost only their DMA —
flash-attention's block-skip trick applied to MIL pooling. Scored mode
stays ungated (every score block must be written).

Forward-only: training uses the XLA path (autodiff-friendly); this kernel
serves inference, where the reference's throughput story lives.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_PAD = 8  # task axis padded to one sublane tile (real tasks T=2)
NEG_INF = -1e30


def _online_update(s, h, mask, m_prev, d_prev, acc, compute_dtype):
    """THE flash-softmax accumulator update, shared by every kernel body
    (bf16 single-bag, bag-pair, int8) so the masked-max / NEG_INF guards can
    never diverge between variants.

    Plain-array math (no refs): ``s`` [..., R, T_PAD] raw scores for this
    tile's R rows, ``h`` [..., R, H] pooled-value rows, ``mask`` [..., R],
    carried stats ``m_prev``/``d_prev`` [..., T_PAD], ``acc`` [..., T_PAD, H]
    f32. Returns (m_new, d_new, acc_new). Leading dims (the bag-pair body's
    [2]) batch through.
    """
    s_masked = jnp.where(mask[..., None] > 0, s, NEG_INF)  # [..., R, T_PAD]
    tile_max = jnp.max(s_masked, axis=-2)  # [..., T_PAD]
    m_new = jnp.maximum(m_prev, tile_max)
    # guard fully-masked-so-far: keep exp args finite
    m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
    e = jnp.exp(s_masked - m_safe[..., None, :]) * (mask[..., None] > 0)
    corr = jnp.exp(jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev) - m_safe)
    d_new = d_prev * corr + jnp.sum(e, axis=-2)
    # acc: [..., T_PAD, H] — rescale then add e^T @ h (batched over leading dims)
    if e.ndim == 2:
        contrib = jax.lax.dot_general(
            e.astype(compute_dtype), h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        contrib = jax.lax.dot_general(
            e.astype(compute_dtype), h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    return m_new, d_new, acc * corr[..., None] + contrib


def _pad_task_head(wc: jax.Array, bc: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Zero-pad the [A, T] score head + [T] bias out to T_PAD task columns
    (shared by `_pad_params` and `_flat_qparams`)."""
    t = wc.shape[1]
    if t > T_PAD:
        raise ValueError(f"n_tasks {t} > T_PAD {T_PAD}")
    return jnp.pad(wc, ((0, 0), (0, T_PAD - t))), jnp.pad(bc, (0, T_PAD - t))


def _pool_kernel_body(
    x_ref, mask_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    wab_ref, bab_ref, wc_ref, bc_ref,
    m_out_ref, scores_out_ref, acc_ref, stat_ref,
    stats_out_ref=None,
):
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        stat_ref[0, :] = jnp.full((T_PAD,), NEG_INF, jnp.float32)
        stat_ref[1, :] = jnp.zeros((T_PAD,), jnp.float32)

    x = x_ref[0]  # [TILE_N, D]
    mask = mask_ref[0, 0]  # [TILE_N]

    def _tile_work():
        h = jnp.maximum(
            jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0
        ).astype(x.dtype)
        h = jnp.maximum(
            jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:], 0.0
        ).astype(x.dtype)
        # one fused [H, 2A] matmul for both gate branches instead of two [H, A]
        # calls: measured +12% kernel throughput at 8192x1024 bf16
        # (experiments/mfu_probe.py 'fusedab' vs 'full')
        uv = jnp.dot(h, wab_ref[:], preferred_element_type=jnp.float32) + bab_ref[:]
        a_dim = wab_ref.shape[1] // 2
        # transcendentals stay fp32: Mosaic (this jaxlib) rejects bf16
        # tanh/sigmoid lowering (f32-constant broadcasts into bf16 vectors)
        a = jnp.tanh(uv[:, :a_dim])
        g = jax.nn.sigmoid(uv[:, a_dim:])
        gated = (a * g).astype(x.dtype)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]  # [TILE_N, T_PAD]

        # raw scores out (pre-mask, like the reference's A_raw before softmax);
        # elided at trace time in the pooled-only fast path
        if scores_out_ref is not None:
            scores_out_ref[0] = s.T

        m_new, d_new, acc_new = _online_update(
            s, h, mask, stat_ref[0, :], stat_ref[1, :], acc_ref[:], x.dtype
        )
        acc_ref[:] = acc_new
        stat_ref[0, :] = m_new
        stat_ref[1, :] = d_new

    if scores_out_ref is not None:
        # scored mode: every score block must be written (downstream
        # masked_softmax would otherwise read uninitialized memory)
        _tile_work()
    else:
        # classification mode: a bag just over a bucket boundary leaves whole
        # tiles of pure padding (up to ~40% of the grid for a bag at
        # bucket/2+1); the online update is the identity on an all-masked
        # tile, so skip its GEMMs entirely (flash-attention's block-skip
        # trick applied to MIL pooling)
        pl.when(jnp.sum(mask) > 0)(_tile_work)

    @pl.when(i == n_tiles - 1)
    def _finalize():
        if stats_out_ref is None:
            denom = jnp.maximum(stat_ref[1, :], 1e-30)
            m_out_ref[0] = acc_ref[:] / denom[:, None]
        else:
            # partial mode (bag-sharded pooling): emit the UNnormalized
            # accumulator plus (running max, denom) so a cross-shard
            # flash-combine can finish the softmax exactly
            m_out_ref[0] = acc_ref[:]
            stats_out_ref[0] = stat_ref[:]


def _pool_kernel_body_pair(
    x_ref, mask_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    wab_ref, bab_ref, wc_ref, bc_ref,
    m_out_ref, acc_ref, stat_ref,
):
    """Bag-pair fast path: two bags per grid step, their rows merged into one
    [2*TILE_N, D] matmul chain (doubles the MXU M-dim and halves per-step
    overhead; measured +3.3% at 8192x1024 bf16 — experiments/mfu_probe.py
    'b2' vs 'full'), then split back for per-bag online-softmax bookkeeping.
    Classification-only (no score output); used when B is even."""
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        stat_ref[:, 0, :] = jnp.full((2, T_PAD), NEG_INF, jnp.float32)
        stat_ref[:, 1, :] = jnp.zeros((2, T_PAD), jnp.float32)

    x2 = x_ref[:]  # [2, TILE_N, D]
    tile = x2.shape[1]
    xm = x2.reshape(2 * tile, x2.shape[2])
    mask = mask_ref[:, 0, :]  # [2, TILE_N]

    def _tile_work():
        h = jnp.maximum(
            jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0
        ).astype(xm.dtype)
        h = jnp.maximum(
            jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:], 0.0
        ).astype(xm.dtype)
        uv = jnp.dot(h, wab_ref[:], preferred_element_type=jnp.float32) + bab_ref[:]
        a_dim = wab_ref.shape[1] // 2
        a = jnp.tanh(uv[:, :a_dim])
        g = jax.nn.sigmoid(uv[:, a_dim:])
        gated = (a * g).astype(xm.dtype)
        s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]  # [2*TILE_N, T_PAD]

        s3 = s.reshape(2, tile, T_PAD)
        h3 = h.reshape(2, tile, h.shape[1])
        m_new, d_new, acc_new = _online_update(
            s3, h3, mask, stat_ref[:, 0, :], stat_ref[:, 1, :], acc_ref[:], xm.dtype
        )
        acc_ref[:] = acc_new
        stat_ref[:, 0, :] = m_new
        stat_ref[:, 1, :] = d_new

    # skip tiles where BOTH bags are pure padding (per-bag skip is impossible
    # in the merged GEMM, but bucketed batches end near each other)
    pl.when(jnp.sum(mask) > 0)(_tile_work)

    @pl.when(i == n_tiles - 1)
    def _finalize():
        denom = jnp.maximum(stat_ref[:, 1, :], 1e-30)
        m_out_ref[:] = acc_ref[:] / denom[:, :, None]


def _int8_trunk_scores(
    xq, sx_col,
    w1q_ref, sw1_ref, b1_ref, w2q_ref, sw2_ref, b2_ref,
    wabq_ref, swab_ref, bab_ref, wc_ref, bc_ref,
):
    """The int8 trunk+gate+score chain shared by the single-bag and bag-pair
    int8 kernel bodies: the three big GEMMs run int8 x int8 -> int32 on the
    MXU. ``xq`` [R, D] int8 rows with per-row scales ``sx_col`` [R, 1]; the
    h/h2 activations are re-quantized per row in-kernel (f32 round — Mosaic
    rejects bf16 round lowering). Returns (h2 f32 [R, H], s f32 [R, T_PAD])."""

    def requant(y):  # f32 [rows, c] -> (int8, per-row scale)
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-6) / 127.0
        q = jnp.clip(jax.lax.round(y / scale, jax.lax.RoundingMethod.TO_NEAREST_EVEN), -127.0, 127.0)
        return q.astype(jnp.int8), scale[:, 0]

    y1 = jnp.dot(xq, w1q_ref[:], preferred_element_type=jnp.int32)
    h = jnp.maximum(y1.astype(jnp.float32) * (sx_col * sw1_ref[:][None, :]) + b1_ref[:], 0.0)
    hq, sh = requant(h)
    y2 = jnp.dot(hq, w2q_ref[:], preferred_element_type=jnp.int32)
    h2 = jnp.maximum(y2.astype(jnp.float32) * (sh[:, None] * sw2_ref[:][None, :]) + b2_ref[:], 0.0)
    h2q, sh2 = requant(h2)
    uv = jnp.dot(h2q, wabq_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
    uv = uv * (sh2[:, None] * swab_ref[:][None, :]) + bab_ref[:]
    a_dim = wabq_ref.shape[1] // 2
    a = jnp.tanh(uv[:, :a_dim])
    g = jax.nn.sigmoid(uv[:, a_dim:])
    gated = (a * g).astype(jnp.bfloat16)
    s = jnp.dot(gated, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:]  # [R, T_PAD]
    return h2, s


def _pool_kernel_body_int8(
    xq_ref, sx_ref, mask_ref,
    w1q_ref, sw1_ref, b1_ref, w2q_ref, sw2_ref, b2_ref,
    wabq_ref, swab_ref, bab_ref, wc_ref, bc_ref,
    m_out_ref, scores_out_ref, acc_ref, stat_ref,
):
    """int8 variant of :func:`_pool_kernel_body` (measured 5.42 ms vs
    7.24 ms bf16 at [32, 8192, 1024] — experiments/int8_probe.py). Input
    rows arrive pre-quantized with per-row scales (``ops/quantize.py``).
    Softmax bookkeeping is unchanged f32."""
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        stat_ref[0, :] = jnp.full((T_PAD,), NEG_INF, jnp.float32)
        stat_ref[1, :] = jnp.zeros((T_PAD,), jnp.float32)

    xq = xq_ref[0]  # [TILE_N, D] int8
    sx = sx_ref[0, 0]  # [TILE_N] f32
    mask = mask_ref[0, 0]

    def _tile_work():
        h2, s = _int8_trunk_scores(
            xq, sx[:, None],
            w1q_ref, sw1_ref, b1_ref, w2q_ref, sw2_ref, b2_ref,
            wabq_ref, swab_ref, bab_ref, wc_ref, bc_ref,
        )

        if scores_out_ref is not None:
            scores_out_ref[0] = s.T

        m_new, d_new, acc_new = _online_update(
            s, h2.astype(jnp.bfloat16), mask, stat_ref[0, :], stat_ref[1, :],
            acc_ref[:], jnp.bfloat16,
        )
        acc_ref[:] = acc_new
        stat_ref[0, :] = m_new
        stat_ref[1, :] = d_new

    if scores_out_ref is not None:
        _tile_work()  # scored mode: every score block must be written
    else:
        pl.when(jnp.sum(mask) > 0)(_tile_work)  # skip all-padding tiles

    @pl.when(i == n_tiles - 1)
    def _finalize():
        denom = jnp.maximum(stat_ref[1, :], 1e-30)
        m_out_ref[0] = acc_ref[:] / denom[:, None]


def _pool_kernel_body_int8_pair(
    xq_ref, sx_ref, mask_ref,
    w1q_ref, sw1_ref, b1_ref, w2q_ref, sw2_ref, b2_ref,
    wabq_ref, swab_ref, bab_ref, wc_ref, bc_ref,
    m_out_ref, acc_ref, stat_ref,
):
    """int8 twin of :func:`_pool_kernel_body_pair`: two bags per grid step,
    rows merged into one [2*TILE_N, D] int8 GEMM chain. The int8 step has a
    larger fixed-overhead fraction than bf16 (it finishes 1.34x sooner), so
    halving per-step overhead pays at least the bf16 pair path's +3%.
    Classification-only (no score output); used when B is even."""
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        stat_ref[:, 0, :] = jnp.full((2, T_PAD), NEG_INF, jnp.float32)
        stat_ref[:, 1, :] = jnp.zeros((2, T_PAD), jnp.float32)

    xq2 = xq_ref[:]  # [2, TILE_N, D] int8
    tile = xq2.shape[1]
    xm = xq2.reshape(2 * tile, xq2.shape[2])
    # merged per-row scales: [2, 1, tile] -> [2*tile, 1]. The direct reshape
    # is a lane->sublane shape cast that newer Mosaic (terminal libtpu
    # 2026-01) rejects ("infer-vector-layout: unsupported shape cast");
    # swapaxes-then-merge-leading-dims lowers fine (probed on-chip).
    sx2 = jnp.swapaxes(sx_ref[:], 1, 2).reshape(2 * tile, 1)
    mask = mask_ref[:, 0, :]  # [2, TILE_N]

    def _tile_work():
        h2, s = _int8_trunk_scores(
            xm, sx2,
            w1q_ref, sw1_ref, b1_ref, w2q_ref, sw2_ref, b2_ref,
            wabq_ref, swab_ref, bab_ref, wc_ref, bc_ref,
        )

        s3 = s.reshape(2, tile, T_PAD)
        h3 = h2.astype(jnp.bfloat16).reshape(2, tile, h2.shape[1])
        m_new, d_new, acc_new = _online_update(
            s3, h3, mask, stat_ref[:, 0, :], stat_ref[:, 1, :], acc_ref[:], jnp.bfloat16
        )
        acc_ref[:] = acc_new
        stat_ref[:, 0, :] = m_new
        stat_ref[:, 1, :] = d_new

    pl.when(jnp.sum(mask) > 0)(_tile_work)  # skip tiles where both bags are padding

    @pl.when(i == n_tiles - 1)
    def _finalize():
        denom = jnp.maximum(stat_ref[:, 1, :], 1e-30)
        m_out_ref[:] = acc_ref[:] / denom[:, :, None]


def _flat_qparams(qparams: dict[str, Any]) -> tuple:
    """quantize_pool_params dict -> the kernel's flat operand tuple, with the
    score head padded to T_PAD columns (zero-padded like ``_pad_params``)."""
    wc, bc = _pad_task_head(
        jnp.asarray(qparams["wc"], jnp.bfloat16), jnp.asarray(qparams["bc"], jnp.float32)
    )
    return (qparams["w1q"], qparams["sw1"], qparams["b1"],
            qparams["w2q"], qparams["sw2"], qparams["b2"],
            qparams["wabq"], qparams["swab"], qparams["bab"], wc, bc)


@functools.partial(jax.jit, static_argnames=("interpret", "with_scores"))
def _pallas_pool_int8_call(qparams, xq, sx, mask, interpret=False, with_scores=True):
    b, n, d = xq.shape
    h_dim = qparams["w2q"].shape[1]
    tile = _tile_n(n, 2)  # keep the bf16 tile ladder: 1024 rows max
    flat = _flat_qparams(qparams)
    sx = sx.astype(jnp.float32)[:, None, :]  # [B, 1, N]
    mask = mask.astype(jnp.float32)[:, None, :]

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]

    # bag-pair fast path, mirroring _pallas_pool_call's: classification-only,
    # even batch. int8 input blocks are half the bf16 path's bytes, but the
    # f32 trunk intermediates double with the merged 2*tile rows — raise the
    # scoped-VMEM cap accordingly (physical v5e VMEM is far larger).
    if not with_scores and b % 2 == 0:
        outs = pl.pallas_call(
            _pool_kernel_body_int8_pair,
            grid=(b // 2, n // tile),
            in_specs=[
                pl.BlockSpec((2, tile, d), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *param_specs,
            ],
            out_specs=[pl.BlockSpec((2, T_PAD, h_dim), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, T_PAD, h_dim), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((2, T_PAD, h_dim), jnp.float32),
                pltpu.VMEM((2, 2, T_PAD), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
        )(xq, sx, mask, *flat)
        return outs[0], None

    grid = (b, n // tile)
    out_specs = [pl.BlockSpec((1, T_PAD, h_dim), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, T_PAD, h_dim), jnp.float32)]
    if with_scores:
        out_specs.append(pl.BlockSpec((1, T_PAD, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, T_PAD, n), jnp.float32))

        def kernel(xq_r, sx_r, m_r, *rest):
            *ps, m_out, s_out, acc, stat = rest
            _pool_kernel_body_int8(xq_r, sx_r, m_r, *ps, m_out, s_out, acc, stat)

    else:

        def kernel(xq_r, sx_r, m_r, *rest):
            *ps, m_out, acc, stat = rest
            _pool_kernel_body_int8(xq_r, sx_r, m_r, *ps, m_out, None, acc, stat)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T_PAD, h_dim), jnp.float32),
            pltpu.VMEM((2, T_PAD), jnp.float32),
        ],
        interpret=interpret,
    )(xq, sx, mask, *flat)
    if with_scores:
        return outs[0], outs[1]
    return outs[0], None


def pallas_pool_int8(
    qparams: dict[str, Any],
    xq: jax.Array,  # [B, N, D] int8 (pre-quantized rows, ops/quantize.py)
    sx: jax.Array,  # [B, N] f32 per-row scales
    mask: jax.Array,  # [B, N]
    *,
    return_scores: bool = False,
    with_attention: bool = True,
    interpret: bool = False,
):
    """int8 twin of :func:`pallas_trunk_attention_pool` for pre-quantized
    bags. Same return contract: (M [B, T, H], A [B, T, N] | None[, scores]).
    Parity oracle: :func:`toad_tpu.ops.quantize.xla_int8_pool`."""
    t = qparams["wc"].shape[1]
    want_scores = with_attention or return_scores
    m_pad, scores_pad = _pallas_pool_int8_call(
        qparams, xq, sx, mask, interpret=interpret, with_scores=want_scores
    )
    return _finish_pool(m_pad, scores_pad, t, mask, want_scores, return_scores)


def _pad_params(params: dict[str, Any], dtype) -> tuple:
    """Flatten + pad attention output to T_PAD tasks; weights in compute
    dtype, biases f32. The two gate branches (Wa|Wb) concatenate into one
    [H, 2A] weight so the kernel issues a single wider MXU matmul."""
    w1 = params["trunk"]["fc1"]["w"].astype(dtype)
    b1 = params["trunk"]["fc1"]["b"].astype(jnp.float32)
    w2 = params["trunk"]["fc2"]["w"].astype(dtype)
    b2 = params["trunk"]["fc2"]["b"].astype(jnp.float32)
    wab = jnp.concatenate(
        [params["attn"]["a"]["w"], params["attn"]["b"]["w"]], axis=1
    ).astype(dtype)
    bab = jnp.concatenate(
        [params["attn"]["a"]["b"], params["attn"]["b"]["b"]]
    ).astype(jnp.float32)
    wc, bc = _pad_task_head(
        params["attn"]["c"]["w"].astype(dtype), params["attn"]["c"]["b"].astype(jnp.float32)
    )
    return w1, b1, w2, b2, wab, bab, wc, bc


def _tile_n(n: int, itemsize: int) -> int:
    """Largest tile that fits VMEM with double-buffered input blocks:
    bf16 affords 1024-row tiles; fp32 tops out at 512."""
    max_tile = 1024 if itemsize <= 2 else 512
    for t in (1024, 512, 256, 128):
        if t <= max_tile and n % t == 0:
            return t
    raise ValueError(f"bag bucket {n} must be a multiple of 128 for the Pallas kernel")


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret", "with_scores", "partial"))
def _pallas_pool_call(params, x, mask, compute_dtype=jnp.bfloat16, interpret=False, with_scores=True, partial=False):
    b, n, d = x.shape
    h_dim = params["trunk"]["fc2"]["w"].shape[1]
    tile = _tile_n(n, jnp.dtype(compute_dtype).itemsize)
    flat = _pad_params(params, compute_dtype)
    x = x.astype(compute_dtype)
    mask = mask.astype(jnp.float32)[:, None, :]  # [B, 1, N] for TPU tiling

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]

    # bag-pair fast path: classification-only, even batch. The merged
    # [2, tile, D] input block is 4 MB for both dtypes (bf16 tile=1024,
    # fp32 tile=512), same VMEM budget as before relative to _tile_n.
    if not with_scores and not partial and b % 2 == 0:
        grid2 = (b // 2, n // tile)
        outs = pl.pallas_call(
            _pool_kernel_body_pair,
            grid=grid2,
            in_specs=[
                pl.BlockSpec((2, tile, d), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
                *param_specs,
            ],
            out_specs=[pl.BlockSpec((2, T_PAD, h_dim), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, T_PAD, h_dim), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((2, T_PAD, h_dim), jnp.float32),
                pltpu.VMEM((2, 2, T_PAD), jnp.float32),
            ],
            # the merged 2-bag block plus f32 intermediates overflows the
            # 16 MB default scoped-VMEM budget (and scoped accounting varies
            # ~1% across libtpu builds — a 24 MB cap OOM'd by 50 KB after a
            # terminal upgrade); v5e physical VMEM is far larger, so raise
            # the cap for this kernel only, with headroom
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
            interpret=interpret,
        )(x, mask, *flat)
        return outs[0], None

    grid = (b, n // tile)

    out_specs = [pl.BlockSpec((1, T_PAD, h_dim), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, T_PAD, h_dim), jnp.float32)]
    if partial:
        if with_scores:
            raise ValueError("partial mode is classification-only (no score output)")
        out_specs.append(pl.BlockSpec((1, 2, T_PAD), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 2, T_PAD), jnp.float32))

        def kernel(x_r, m_r, *rest):
            *ps, m_out, st_out, acc, stat = rest
            _pool_kernel_body(x_r, m_r, *ps, m_out, None, acc, stat, stats_out_ref=st_out)

    elif with_scores:
        out_specs.append(pl.BlockSpec((1, T_PAD, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, T_PAD, n), jnp.float32))

        def kernel(x_r, m_r, *rest):
            *ps, m_out, s_out, acc, stat = rest
            _pool_kernel_body(x_r, m_r, *ps, m_out, s_out, acc, stat)

    else:

        def kernel(x_r, m_r, *rest):
            *ps, m_out, acc, stat = rest
            _pool_kernel_body(x_r, m_r, *ps, m_out, None, acc, stat)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T_PAD, h_dim), jnp.float32),
            pltpu.VMEM((2, T_PAD), jnp.float32),
        ],
        interpret=interpret,
    )(x, mask, *flat)
    if with_scores or partial:
        return outs[0], outs[1]
    return outs[0], None


def pallas_trunk_attention_pool(
    params: dict[str, Any],
    x: jax.Array,  # [B, N, D]
    mask: jax.Array,  # [B, N]
    *,
    compute_dtype=jnp.bfloat16,
    return_scores: bool = False,
    with_attention: bool = True,
    interpret: bool = False,
):
    """Drop-in fused replacement for the XLA path of
    :func:`toad_tpu.ops.fused_pool.fused_trunk_attention_pool`.

    Returns (M [B, T, H], A [B, T, N] softmax weights[, scores [B, N, T]]).
    With ``with_attention=False`` (pure classification, no heatmaps) the
    kernel skips writing the [B, T, N] score tensor entirely and A is None.
    """
    t = params["attn"]["c"]["w"].shape[1]
    want_scores = with_attention or return_scores
    m_pad, scores_pad = _pallas_pool_call(
        params,
        x,
        mask,
        compute_dtype=jnp.dtype(compute_dtype),
        interpret=interpret,
        with_scores=want_scores,
    )
    return _finish_pool(m_pad, scores_pad, t, mask, want_scores, return_scores)


def _finish_pool(m_pad, scores_pad, t, mask, want_scores, return_scores):
    """Shared wrapper tail: strip T_PAD padding, derive softmax weights from
    the raw scores (cheap: [B, T, N] elementwise + reduce), shape returns."""
    m = m_pad[:, :t, :]
    if not want_scores:
        return m, None
    scores_t = scores_pad[:, :t, :]  # [B, T, N]
    from toad_tpu.ops.pooling import masked_softmax

    attn = masked_softmax(scores_t, mask[:, None, :], axis=-1)
    if return_scores:
        return m, attn, jnp.swapaxes(scores_t, 1, 2)
    return m, attn


def pallas_pool_partial(
    params: dict[str, Any],
    x: jax.Array,  # [B, N_local, D] — one shard of the bag's patch dim
    mask: jax.Array,  # [B, N_local]
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Shard-local flash statistics for bag-sharded pooling.

    Returns (acc [B, T_PAD, H] f32, stats [B, 2, T_PAD] f32) where
    ``acc = sum_i exp(s_i - max) * h_i`` over the local patches,
    ``stats[:, 0] = max`` (running local max, NEG_INF if fully masked) and
    ``stats[:, 1] = denom``. Combine shards with
    :func:`toad_tpu.parallel.bag_shard.combine_partial_pool`.
    Un-gated params (no attn.b) fall back to the jnp partial.
    """
    if "b" not in params["attn"]:
        return xla_pool_partial(params, x, mask, compute_dtype=compute_dtype)
    return _pallas_pool_call(
        params, x, mask, compute_dtype=jnp.dtype(compute_dtype), interpret=interpret,
        with_scores=False, partial=True,
    )


def xla_pool_partial(params: dict[str, Any], x: jax.Array, mask: jax.Array, *, compute_dtype=jnp.float32):
    """jnp reference of :func:`pallas_pool_partial` — used off-TPU and as the
    parity oracle. Only the first ``t`` (real-task) columns of the T_PAD-wide
    outputs match the kernel: padding columns here carry (max=NEG_INF,
    denom=0) while the kernel's zero-padded wc columns yield (max=0,
    denom=n_real) with acc=sum(h). Consumers (combine_partial_pool callers)
    must slice ``[:, :t]`` and never trust the filler columns."""
    from toad_tpu.ops.fused_pool import _trunk_scores

    h, scores = _trunk_scores(params, x, jnp.dtype(compute_dtype))  # [B,N,H], [B,N,T]
    t = scores.shape[-1]
    s = jnp.where(mask[:, :, None] > 0, scores, NEG_INF)  # [B, N, T]
    mx = jnp.max(s, axis=1)  # [B, T]
    safe = jnp.where(mx <= NEG_INF / 2, 0.0, mx)
    e = jnp.exp(s - safe[:, None, :]) * (mask[:, :, None] > 0)  # [B, N, T]
    denom = e.sum(axis=1)  # [B, T]
    acc = jnp.einsum("bnt,bnh->bth", e, h.astype(jnp.float32))  # [B, T, H]
    pad = T_PAD - t
    acc = jnp.pad(acc, ((0, 0), (0, pad), (0, 0)))
    stats = jnp.stack([jnp.pad(mx, ((0, 0), (0, pad)), constant_values=NEG_INF),
                       jnp.pad(denom, ((0, 0), (0, pad)))], axis=1)
    return acc, stats
