"""Dynamic request batching for online MIL inference.

The reference has no serving story at all: its only inference entry point is
``eval_mtl_concat.py``, which requires a labeled CSV and walks a DataLoader
one bag at a time (``/root/reference/utils/eval_utils_mtl_concat.py:65-114``).
For production serving on TPU the economics are inverted — a single forward
over a padded ``[B, N, 1024]`` batch costs barely more than ``B == 1`` (the
pooling stack is HBM-bound, SURVEY §3.2) — so the server must *coalesce*
concurrent requests into batches to reach the hardware's throughput.

:class:`DynamicBatcher` implements the standard dynamic-batching discipline:

- requests arrive on arbitrary threads and enqueue ``(features, sex, future)``;
- a single dispatch thread collects up to ``max_batch`` requests, waiting at
  most ``max_wait_ms`` after the first arrival (latency bound under low load,
  full batches under high load);
- requests are grouped by padding bucket (the same ladder the training
  batcher uses, so serving reuses the already-compiled shapes), the batch
  dimension is padded to a power of two, and one jitted forward serves the
  whole group. Compile count is bounded by ``len(buckets) * log2(max_batch)``.

Everything here is stdlib threading + the existing jitted model — no new
runtime dependencies.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, NamedTuple, Sequence

import numpy as np

from toad_tpu.config import DEFAULT_BUCKETS, ModelConfig
from toad_tpu.data.batching import bucket_for
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.pipeline.infer import SlidePrediction


@dataclass(frozen=True)
class ServeConfig:
    """Serving knobs (see module docstring for the batching discipline)."""

    max_batch: int = 32
    max_wait_ms: float = 5.0
    bucket_sizes: tuple[int, ...] = DEFAULT_BUCKETS
    # default for requests that don't say: attention costs an extra [B,T,N]
    # HBM tensor, so it's opt-in per request (submit(..., attention=True))
    need_attention: bool = False
    # host->device feature dtype: 'bfloat16' halves transfer bytes — the
    # serving bottleneck whenever requests carry host-resident features.
    # 'auto' (default) picks bfloat16 iff the model computes in bf16, where
    # the host-side cast is numerically invisible (round-to-nearest-even
    # either side of the wire); 'float32' is exact under f32 compute
    transfer_dtype: str = "auto"
    # int8 quantized inference (ops/quantize.py): bags quantized per-row in
    # the handler thread, H2D carries int8 (4x fewer bytes than f32), and the
    # pooling GEMMs run at the MXU's int8 rate (measured 1.45x the bf16
    # kernel). Heads/softmax stay f32. Overrides transfer_dtype.
    int8: bool = False
    # calibration: scale class probabilities to temperature T (the T fitted
    # by `evaluate --calibrate`, evaluate/calibration.py). Argmax/topk order
    # invariant; site probabilities stay raw (T is fitted on the origin head)
    temperature: float = 1.0


class _Request(NamedTuple):
    features: np.ndarray  # [n, D] float32 (or int8 in int8 mode), truncated to max bucket
    n: int
    bucket: int
    sex: int
    attention: bool
    future: Future
    scales: np.ndarray | None = None  # [n] f32 per-row quant scales (int8 mode)


class BatcherStats(NamedTuple):
    requests: int
    batches: int
    batched_slides: int  # == requests that have been served
    padded_slots: int  # wasted batch slots from power-of-two padding

    @property
    def mean_batch_size(self) -> float:
        return self.batched_slides / self.batches if self.batches else 0.0


def _pow2_at_least(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class DynamicBatcher:
    """Coalesces concurrent single-slide requests into padded batched
    forwards. Thread-safe; use as a context manager or call :meth:`close`.

    Pass a ``('data','bag')`` :class:`jax.sharding.Mesh` to serve
    data-parallel over multiple chips: params replicate, request batches
    shard the batch dim over ``data`` and the patch dim over ``bag`` (exact
    for attention pooling — SURVEY §2.2), and GSPMD inserts the ICI
    collectives. Single-chip behavior is unchanged when ``mesh is None``.
    """

    def __init__(self, params: Any, model_cfg: ModelConfig, cfg: ServeConfig = ServeConfig(), mesh=None):
        import jax

        self.model = ToadMIL(model_cfg)
        # mean-of-folds ensemble serving: pass a LIST of member param trees
        # and the batcher stacks them on a leading axis and runs every member
        # inside ONE jitted forward (one dispatch per request batch, one
        # compiled program per shape, K x the FLOPs) instead of K sequential
        # dispatches. Combination rule matches
        # pipeline/infer.py::EnsembleInference: per-member temperature-scaled
        # class softmax -> arithmetic mean; attention -> mean of the members'
        # masked-softmax pooling weights.
        # ensemble semantics key off the MODE (a list was passed), not the
        # member count: a 1-fold results dir served with --ensemble must keep
        # the documented ensemble contract (softmaxed mean attention weights,
        # on-device temperature) rather than silently degrading to raw scores
        self.ensemble = isinstance(params, (list, tuple))
        members = list(params) if self.ensemble else [params]
        if not members:
            raise ValueError("DynamicBatcher needs at least one parameter tree")
        self.n_members = len(members)
        if self.ensemble:
            import jax.numpy as jnp

            params = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *members)
        else:
            params = members[0]
        if cfg.transfer_dtype == "auto":
            from dataclasses import replace

            from toad_tpu.data.batching import resolve_transfer_dtype

            cfg = replace(cfg, transfer_dtype=resolve_transfer_dtype("auto", model_cfg.compute_dtype))
        self.cfg = cfg
        self.buckets = tuple(sorted(cfg.bucket_sizes))
        self.mesh = mesh
        if mesh is not None:
            from toad_tpu.parallel.sharding import batch_shardings, replicate

            bag_n = mesh.shape["bag"]
            bad = [b for b in self.buckets if b % bag_n]
            if bad:
                raise ValueError(f"bucket sizes {bad} not divisible by bag axis {bag_n}")
            self._data_n = mesh.shape["data"]
            sh = batch_shardings(mesh)
            self._shardings = (sh["features"], sh["patch_mask"], sh["sex"])
            params = replicate(mesh, params)
        else:
            self._data_n = 1
            self._shardings = None
            # commit params to device up front: restore_params/load_params_any
            # return host numpy leaves, and leaving them on host would re-upload
            # the whole tree over the (erratic) H2D link on every batch
            params = jax.device_put(params)
        self.params = params
        self._queue: queue.SimpleQueue = queue.SimpleQueue()
        self._stop = threading.Event()
        # serializes submit-enqueue against close(): without it a submit that
        # passed the is_set() check could enqueue after the final drain and
        # hang its caller forever
        self._submit_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._requests = 0
        self._batches = 0
        self._batched = 0
        self._padded = 0

        if cfg.int8:
            from toad_tpu.ops.quantize import quantize_pool_params

            if self.ensemble:
                import jax.numpy as jnp

                # quantize each member's trunk separately (per-channel scales
                # are per member), THEN stack for the vmapped forward
                qps = [quantize_pool_params(m) for m in members]
                qp = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *qps)
            else:
                qp = quantize_pool_params(self.params)
            if mesh is not None:
                from toad_tpu.parallel.sharding import replicate

                qp = replicate(mesh, qp)
            self.qparams = jax.device_put(qp) if mesh is None else qp

            def fwd_q(params, qparams, feats, scales, mask, sex, need_attention: bool):
                def one(p, q):
                    out = self.model.apply_int8(
                        p, q, feats, scales, mask, sex, need_attention=need_attention
                    )
                    return out.logits, out.site_prob, (out.attention if need_attention else out.logits)

                return self._combine(one, (params, qparams), mask, need_attention)

            self._fwd_int8 = jax.jit(fwd_q, static_argnames=("need_attention",))
        else:
            self.qparams = None

            def fwd(params, feats, mask, sex, need_attention: bool):
                def one(p):
                    out = self.model.apply(
                        p, feats, mask, sex, train=False, need_attention=need_attention
                    )
                    return out.logits, out.site_prob, (out.attention if need_attention else out.logits)

                return self._combine(one, (params,), mask, need_attention)

            self._fwd = jax.jit(fwd, static_argnames=("need_attention",))
        self._thread = threading.Thread(target=self._run, name="toad-serve-batcher", daemon=True)
        self._thread.start()

    # -- client side -----------------------------------------------------------

    def submit(self, features: np.ndarray, sex: int, attention: bool | None = None) -> Future:
        """Enqueue one bag ``[n, D]``; the Future resolves to a
        :class:`~toad_tpu.pipeline.infer.SlidePrediction`. ``attention=None``
        falls back to ``ServeConfig.need_attention``."""
        if self._stop.is_set():
            raise RuntimeError("batcher is closed")
        features = np.asarray(features, np.float32)
        if features.ndim != 2:
            raise ValueError(f"features must be [n_patches, dim], got shape {features.shape}")
        if features.shape[1] != self.model.config.in_dim:
            raise ValueError(
                f"feature dim {features.shape[1]} != model in_dim {self.model.config.in_dim}"
            )
        n = int(features.shape[0])
        if n == 0:
            raise ValueError("empty bag")
        top = self.buckets[-1]
        if n > top:  # truncate before quantizing so dropped rows aren't quantized
            features, n = features[:top], top
        scales = None
        if self.cfg.int8:
            # quantize here, on the HANDLER thread: spreads the quant cost
            # across concurrent clients and the queue + H2D carry int8
            from toad_tpu.ops.quantize import quantize_rows_np

            features, scales = quantize_rows_np(features)
        return self._enqueue(features, scales, n, int(sex), attention)

    def predict(self, features: np.ndarray, sex: int, attention: bool | None = None) -> SlidePrediction:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(features, sex, attention).result()

    def submit_quantized(
        self, xq: np.ndarray, scales: np.ndarray, sex: int, attention: bool | None = None
    ) -> Future:
        """int8 mode only: enqueue pre-quantized rows ``[n, D]`` int8 +
        ``[n]`` f32 scales (e.g. from an int8 bag store,
        ``data/bags.py::load_bag_quantized``), skipping the handler-thread
        quantization pass."""
        if not self.cfg.int8:
            raise ValueError("submit_quantized requires ServeConfig(int8=True)")
        if self._stop.is_set():
            raise RuntimeError("batcher is closed")
        xq = np.asarray(xq)
        if xq.dtype != np.int8:
            # a float bag passed here by mistake would truncate to garbage
            # int8 values and be served as a confident wrong answer
            raise TypeError(
                f"submit_quantized expects int8 rows (use submit() for float "
                f"features), got dtype {xq.dtype}"
            )
        scales = np.asarray(scales, np.float32)
        if xq.ndim != 2 or xq.shape[1] != self.model.config.in_dim:
            raise ValueError(f"xq must be [n_patches, {self.model.config.in_dim}] int8, got {xq.shape}")
        if scales.shape != (xq.shape[0],):
            raise ValueError(f"scales must be [{xq.shape[0]}], got {scales.shape}")
        n = int(xq.shape[0])
        if n == 0:
            raise ValueError("empty bag")
        return self._enqueue(xq, scales, n, int(sex), attention)

    def _enqueue(
        self, features: np.ndarray, scales: np.ndarray | None, n: int, sex: int,
        attention: bool | None,
    ) -> Future:
        """Shared submit tail: bucket + head-truncate, then the close-race-safe
        enqueue (the _submit_lock re-check keeps a submit that passed the
        is_set() check from enqueueing after close()'s final drain)."""
        bucket = bucket_for(n, self.buckets)
        if n > bucket:  # longer than the largest bucket: head-truncate (batcher policy)
            features, n = features[:bucket], bucket
            if scales is not None:
                scales = scales[:bucket]
        fut: Future = Future()
        want_attn = self.cfg.need_attention if attention is None else bool(attention)
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("batcher is closed")
            with self._stats_lock:
                self._requests += 1
            self._queue.put(_Request(features, n, bucket, sex, want_attn, fut, scales))
        return fut

    def stats(self) -> BatcherStats:
        with self._stats_lock:
            return BatcherStats(self._requests, self._batches, self._batched, self._padded)

    # -- dispatch thread ---------------------------------------------------------

    def _collect(self) -> list[_Request]:
        """Block for the first request, then drain up to max_batch within the
        max_wait window."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:  # close() sentinel
            return []
        batch = [first]
        deadline = time.monotonic() + self.cfg.max_wait_ms / 1e3
        while len(batch) < self.cfg.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                break
            batch.append(req)
        return batch

    def _serve_groups(self, batch: list[_Request]) -> None:
        groups: dict[tuple[int, bool], list[_Request]] = {}
        for r in batch:
            groups.setdefault((r.bucket, r.attention), []).append(r)
        for (bucket, want_attn), group in groups.items():
            # the dispatch thread is a singleton: it must survive EVERY
            # failure (batch-assembly MemoryError included), else all
            # pending and future requests hang in future.result()
            try:
                self._dispatch(bucket, want_attn, group)
            except BaseException as e:  # noqa: BLE001
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _run(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if batch:
                self._serve_groups(batch)
        # graceful drain: SERVE everything enqueued before close() instead of
        # failing it — submit() holds _submit_lock against close(), so every
        # real request precedes the None sentinel in FIFO order and anything
        # still queued here was accepted pre-shutdown (DEPLOYMENT.md's
        # "SIGTERM drains in-flight requests" contract)
        pending: list[_Request] = []
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                pending.append(req)
        for start in range(0, len(pending), self.cfg.max_batch):
            self._serve_groups(pending[start : start + self.cfg.max_batch])

    def _padded_batch(self, b_requests: int) -> int:
        b_pad = _pow2_at_least(b_requests, self.cfg.max_batch)
        if b_pad % self._data_n:  # mesh data axis needs even batch slices
            b_pad = ((b_pad + self._data_n - 1) // self._data_n) * self._data_n
        return b_pad

    def _assemble(self, bucket: int, b_pad: int, group: Sequence[_Request]):
        """Zero-padded [b_pad, bucket, dim] inputs; rows past len(group) are
        padding (one live zero patch keeps their softmax finite). In int8
        mode also returns the [b_pad, bucket] per-row scale plane."""
        dim = self.model.config.in_dim
        if self.cfg.int8:
            feat_dt = np.dtype(np.int8)
        elif self.cfg.transfer_dtype == "bfloat16":
            import ml_dtypes

            feat_dt = np.dtype(ml_dtypes.bfloat16)
        else:
            feat_dt = np.dtype(np.float32)
        feats = np.zeros((b_pad, bucket, dim), feat_dt)
        mask = np.zeros((b_pad, bucket), np.float32)
        sex = np.zeros((b_pad,), np.int32)
        scales = np.full((b_pad, bucket), 1.0 / 127.0, np.float32) if self.cfg.int8 else None
        for i, r in enumerate(group):
            feats[i, : r.n] = r.features
            mask[i, : r.n] = 1.0
            sex[i] = r.sex
            if scales is not None and r.scales is not None:
                scales[i, : r.n] = r.scales
        mask[len(group) :, 0] = 1.0
        return feats, mask, sex, scales

    def _combine(self, one, param_trees, mask, need_attention: bool):
        """Shared tail of the jitted forwards (traced inside jit).

        Plain serving (no --ensemble): identical to a plain forward — class
        softmax of the f32 logits (== the model's own ``y_prob``), raw
        attention scores; the host applies temperature afterwards, as before.

        Ensemble mode (any member count, including 1): run ``one`` for every slice of the
        stacked member axis — an UNROLLED loop inside the trace, not vmap,
        because the fused Pallas pooling kernel's block specs cannot tile a
        batched weight operand (Mosaic rejects the [K, ...] blocks; probed on
        chip). Still one compiled program and one dispatch per request batch;
        XLA schedules the K independent member forwards itself. Combine with
        :class:`~toad_tpu.pipeline.infer.EnsembleInference`'s rule —
        per-member class softmax at the serving temperature, then the
        arithmetic mean; site softmax mean; attention comes back as the mean
        of the members' masked-softmax pooling *weights* over the real
        patches (raw attention logits are not comparable across members)."""
        import jax
        import jax.numpy as jnp

        if not self.ensemble:
            logits, site_prob, attn = one(*param_trees)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1), site_prob, attn
        outs = [
            one(*(jax.tree.map(lambda x, k=k: x[k], t) for t in param_trees))
            for k in range(self.n_members)
        ]
        logits = jnp.stack([o[0] for o in outs])  # leading member axis K
        site_prob = jnp.stack([o[1] for o in outs])
        attn = jnp.stack([o[2] for o in outs])
        y_prob = jax.nn.softmax(
            logits.astype(jnp.float32) / self.cfg.temperature, axis=-1
        ).mean(axis=0)
        site_prob = site_prob.astype(jnp.float32).mean(axis=0)
        if need_attention:
            a = attn.astype(jnp.float32)  # [K, B, T, N]
            a = jnp.where(mask[None, :, None, :] > 0, a, jnp.finfo(jnp.float32).min)
            attn = jax.nn.softmax(a, axis=-1).mean(axis=0)
        else:
            attn = attn[0]  # placeholder arm
        return y_prob, site_prob, attn

    def _device_forward(self, feats, mask, sex, want_attn: bool, scales=None):
        import jax

        if self._shardings is not None:
            sf, sm, ss = self._shardings
            feats, mask, sex = (
                jax.device_put(feats, sf),
                jax.device_put(mask, sm),
                jax.device_put(sex, ss),
            )
            if scales is not None:
                scales = jax.device_put(scales, sm)  # same [B, N] layout as the mask
        if self.cfg.int8:
            return self._fwd_int8(
                self.params, self.qparams, feats, scales, mask, sex, need_attention=want_attn
            )
        return self._fwd(self.params, feats, mask, sex, need_attention=want_attn)

    def warmup(
        self,
        buckets: Sequence[int] | None = None,
        batch_sizes: Sequence[int] | None = None,
        attention: bool | None = None,
    ) -> int:
        """Pre-compile the jitted forward for the shapes requests will hit, so
        first requests don't pay first-touch XLA compiles (which stretch from
        tens of seconds to minutes under tenant contention — VERDICT r1 #7).

        Defaults: every configured bucket × the two ends of the batch ladder
        (1 and max_batch — low-load and saturated) × the configured attention
        mode. Synchronous; returns the number of shape variants compiled.
        """
        buckets = tuple(buckets) if buckets else self.buckets
        bad = [b for b in buckets if b not in self.buckets]
        if bad:
            raise ValueError(f"warmup buckets {bad} not in the configured ladder {self.buckets}")
        if batch_sizes is None:
            batch_sizes = (1, self.cfg.max_batch)
        attns = (self.cfg.need_attention,) if attention is None else (bool(attention),)
        # cap batch x bucket so giant rungs don't assemble multi-GB zero
        # batches (262144-patch bucket x batch 32 would be ~34 GB); a burst
        # of long bags compiles its larger batch shape on first hit instead
        max_slots = 1 << 20  # ~4 GB of f32 feature payload at dim 1024
        done: set[tuple[int, int, bool]] = set()
        for bucket in buckets:
            for bs in batch_sizes:
                bs = max(1, min(int(bs), self.cfg.max_batch, max_slots // bucket))
                b_pad = self._padded_batch(bs)
                for want_attn in attns:
                    key = (bucket, b_pad, want_attn)
                    if key in done:
                        continue
                    done.add(key)
                    feats, mask, sex, scales = self._assemble(bucket, b_pad, ())
                    out = self._device_forward(feats, mask, sex, want_attn, scales)
                    import jax

                    jax.block_until_ready(out)
        return len(done)

    def _dispatch(self, bucket: int, want_attn: bool, group: list[_Request]) -> None:
        import jax

        b = len(group)
        b_pad = self._padded_batch(b)
        feats, mask, sex, scales = self._assemble(bucket, b_pad, group)
        y_prob, site_prob, attn = jax.device_get(
            self._device_forward(feats, mask, sex, want_attn, scales)
        )
        with self._stats_lock:
            self._batches += 1
            self._batched += b
            self._padded += b_pad - b
        y_prob = np.asarray(y_prob)
        if self.cfg.temperature != 1.0 and not self.ensemble:
            # ensembles already applied T per member on device (the mean of
            # per-member T-scaled softmaxes is NOT the T-scaled mean)
            from toad_tpu.evaluate.calibration import apply_temperature

            y_prob = apply_temperature(y_prob, self.cfg.temperature)
        for i, r in enumerate(group):
            yp = y_prob[i]
            sp = np.asarray(site_prob[i])
            # stable sort + argmax y_hat: ties resolve identically to the
            # eval engine and SlideInference (see pipeline/infer.py)
            order = np.argsort(-yp, kind="stable")
            if want_attn:
                a = np.asarray(attn[i, 0, : r.n])
                sa = np.asarray(attn[i, 1, : r.n])
            else:
                a = sa = np.zeros((0,), np.float32)
            pred = SlidePrediction(
                y_hat=int(yp.argmax()),
                y_prob=yp,
                site_hat=int(sp.argmax()),
                site_prob=sp,
                attention=a,
                site_attention=sa,
                topk=[(int(j), float(yp[j])) for j in order],
            )
            if not r.future.done():
                r.future.set_result(pred)

    # -- lifecycle ---------------------------------------------------------------

    def close(self, timeout: float = 60.0) -> bool:
        """Stop the dispatch thread. Returns True once it has fully drained;
        False if it is still mid-forward after `timeout` seconds (e.g. a
        first-touch XLA compile) — callers should not claim a clean drain
        then."""
        with self._submit_lock:
            already = self._stop.is_set()
            self._stop.set()
        if not already:
            self._queue.put(None)
        deadline = time.monotonic() + timeout
        while self._thread.is_alive() and time.monotonic() < deadline:
            self._thread.join(timeout=min(5.0, max(0.0, deadline - time.monotonic())))
        return not self._thread.is_alive()

    def __enter__(self) -> "DynamicBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
