"""Bucketed bag batching with padding masks and threaded device prefetch.

This replaces the reference's DataLoader stack (``utils/utils.py:15-61``:
batch_size=1, one ``torch.load`` + H2D copy + 4 device syncs per slide —
the primary throughput limiter per SURVEY §3.2). TPU-native design:

- each bag's length N is rounded up to a bucket size; bags in a batch share
  one bucket, so device shapes are static per bucket and XLA compiles a
  small, fixed set of programs;
- a batch is ``[B, N_bucket, D]`` features + ``[B, N_bucket]`` patch mask +
  ``[B]`` bag-validity mask (partial final batches are padded, never ragged);
- bag IO runs in a thread pool and finished batches are queued ahead of the
  training step (processes are unnecessary: the heavy lifting is numpy/zip
  reads that release the GIL).

Sampling modes mirror the reference: sequential, shuffled (RandomSampler),
class-balanced with replacement (WeightedRandomSampler — fixed here, the
reference's is a TypeError, see ``utils/utils.py:140-148``), and the 1%
``--testing`` subsample (``utils/utils.py:57-59``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

import numpy as np

from toad_tpu.config import DEFAULT_BUCKETS


@dataclass
class BagBatch:
    """One device-ready batch of padded bags."""

    features: np.ndarray  # [B, N, D] float32 (int8 under transfer_dtype='int8')
    patch_mask: np.ndarray  # [B, N] float32 (1 = real patch)
    bag_mask: np.ndarray  # [B] float32 (1 = real bag)
    label: np.ndarray  # [B] int32
    site: np.ndarray  # [B] int32
    sex: np.ndarray  # [B] int32
    indices: np.ndarray  # [B] int64 — positions within the split (-1 = pad)
    scales: np.ndarray | None = None  # [B, N] f32 per-row quant scales (int8 wire only)

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    @property
    def bucket(self) -> int:
        return self.features.shape[1]


def bucket_for(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; the largest bucket if n exceeds them all
    (in which case the bag gets truncated to it)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def suggest_buckets(counts: np.ndarray, max_buckets: int = 6, multiple_of: int = 128) -> list[int]:
    """Quantile ladder rounded up to multiples of ``multiple_of`` (128 is
    the Pallas tile constraint), deduplicated, capped at ``max_buckets``
    rungs. Every bag fits the top rung by construction (q=1.0 is included)."""
    if len(counts) == 0:
        return []
    qs = np.linspace(0, 1, max_buckets + 1)[1:]
    m = max(int(multiple_of), 1)
    rungs = sorted({int(np.ceil(np.quantile(counts, q) / m) * m) for q in qs})
    return [max(r, m) for r in rungs]


def auto_bucket_ladder(split, max_buckets: int = 6, multiple_of: int = 128) -> tuple[int, ...]:
    """Derive a bucket ladder from the split's REAL patch-count distribution
    using metadata-only reads (``data/bags.py::bag_shape`` — O(1) IO per
    bag). A data-derived ladder cuts the padding overhead the default
    pow2 ladder pays on skewed archives (``cli/validate.py`` reports both).

    Works for :class:`~toad_tpu.data.wsi_dataset.WSIBagSplit` (per-slide
    counts) and :class:`~toad_tpu.data.wsi_dataset.PatientBagSplit`
    (per-patient concat lengths summed over the group's slides)."""
    from toad_tpu.data.bags import bag_shape

    def n_or_none(path):
        try:
            return bag_shape(path)[0]
        except Exception:
            return None  # missing/unreadable: skip from the ladder stats

    groups = getattr(split, "groups", None)
    skipped = 0
    if groups is not None:  # patient-concat bags: sum the group's slides
        parent = split.parent
        slide_n = [n_or_none(parent.bag_file(i)) for i in range(len(parent))]
        counts, out_counts = slide_n, []
        for g in groups:
            ns = [counts[int(i)] for i in g]
            if any(v is None for v in ns):
                skipped += 1
                continue
            out_counts.append(int(sum(ns)))
        counts = np.array(out_counts)
    else:
        ns = [n_or_none(split.bag_file(i)) for i in range(len(split))]
        skipped = sum(v is None for v in ns)
        counts = np.array([v for v in ns if v is not None])
    if skipped:
        # don't fail a run over bags the chosen splits may never touch —
        # `toad_tpu validate` is the loud pre-flight for missing files
        print(f"auto bucket ladder: skipped {skipped} missing/unreadable bag(s)")
    ladder = suggest_buckets(counts, max_buckets=max_buckets, multiple_of=multiple_of)
    if not ladder:
        raise ValueError("auto bucket ladder: no readable bags in the split")
    return tuple(ladder)


def _pad_bag(feats: np.ndarray, bucket: int) -> tuple[np.ndarray, np.ndarray]:
    n, d = feats.shape
    if n > bucket:
        feats = feats[:bucket]
        n = bucket
    out = np.zeros((bucket, d), dtype=np.float32)
    out[:n] = feats
    mask = np.zeros((bucket,), dtype=np.float32)
    mask[:n] = 1.0
    return out, mask


def resolve_transfer_dtype(transfer_dtype: str, compute_dtype: str) -> str:
    """Resolve ``DataConfig.transfer_dtype='auto'`` against the model.

    'auto' → bfloat16 iff the model computes in bf16: the features get cast
    f32→bf16 round-to-nearest-even either way (host producer thread vs on
    device), so casting host-side is numerically invisible AND halves the
    relay H2D bytes — measured 1.87x slides/s on the disk-fed path
    (``experiments/bf16_transfer_probe.py``). With an f32-compute model the
    cast would lose precision, so 'auto' stays float32 there.
    """
    if transfer_dtype != "auto":
        return transfer_dtype
    return "bfloat16" if compute_dtype == "bfloat16" else "float32"


class BagBatcher:
    """Iterate a split as device-ready :class:`BagBatch`es.

    Parameters
    ----------
    split:
        a ``WSIBagSplit`` (anything with ``__len__``, ``load_bag(i)``,
        ``labels/sites/sexes`` arrays and ``class_weights()``).
    batch_size:
        bags per batch. 1 reproduces reference semantics exactly.
    bucket_sizes:
        padding ladder; None → bags pool by EXACT length (reference-parity
        mode, meant for ``batch_size=1``; at ``batch_size>1`` real-world
        bags rarely share a length, so batches stay mostly padding — pass a
        ladder instead; a warning is emitted).
    mode:
        'sequential' | 'shuffle' | 'weighted'.
    """

    def __init__(
        self,
        split,
        batch_size: int = 1,
        bucket_sizes: Sequence[int] | None = DEFAULT_BUCKETS,
        mode: str = "sequential",
        seed: int = 0,
        testing_frac: float | None = None,
        max_bag_size: int | None = None,
        num_workers: int = 8,
        prefetch: int = 2,
        feature_dim: int | None = None,
        native: str = "auto",
        transfer_dtype: str = "float32",
        device_put: bool = False,
        device=None,
    ) -> None:
        self.split = split
        self.batch_size = int(batch_size)
        self.bucket_sizes = tuple(bucket_sizes) if bucket_sizes else None
        self.mode = mode
        self.seed = seed
        self.testing_frac = testing_frac
        self.max_bag_size = max_bag_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.feature_dim = feature_dim
        self.native = native  # 'auto' | 'on' | 'off'
        if transfer_dtype == "auto":
            raise ValueError(
                "transfer_dtype='auto' must be resolved against the model's "
                "compute dtype before constructing a BagBatcher — call "
                "resolve_transfer_dtype(dtype, model_compute_dtype)"
            )
        self.transfer_dtype = transfer_dtype
        self.device_put = device_put
        # target for producer-thread placement; None = JAX's default device.
        # Callers whose step runs elsewhere (params committed to another
        # device) must pass that device/sharding here, or the dispatch would
        # be cross-device.
        self.device = device
        if self.bucket_sizes is None and self.batch_size > 1:
            import warnings

            warnings.warn(
                "bucket_sizes=None pools bags by exact length; at batch_size"
                f"={self.batch_size} batches only fill when bags share a length"
                " (rare for real WSIs) — pass a bucket ladder for throughput",
                stacklevel=2,
            )
        self._payloads: list | None = None  # lazy PayloadInfo cache
        self._lengths: list | None | bool = False  # False = not yet probed
        self.native_active: bool | None = None
        self._epoch = 0

    def _resolve_payloads(self) -> list | None:
        """Resolve every bag's payload metadata ONCE (shared by ``__len__``'s
        length probe and the native-eligibility check — each resolve opens
        the container and parses headers, so doubling it doubles the startup
        stall on big splits). None when the split has no ``bag_file``;
        entries are None for individually unresolvable bags."""
        if self._payloads is not None:
            return self._payloads
        from toad_tpu.data.native_bags import (
            SegmentedPayload,
            resolve_payload,
            resolve_payload_q8,
        )

        def _one(f):
            # f32 payload, else an int8 STORE's raw payloads (read-through
            # eligible only on the int8 wire; still gives exact lengths)
            return resolve_payload(f) or resolve_payload_q8(f)

        if hasattr(self.split, "bag_file"):
            self._payloads = [_one(self.split.bag_file(i)) for i in range(len(self.split))]
        elif hasattr(self.split, "groups") and hasattr(getattr(self.split, "parent", None), "bag_file"):
            # multi-file bags (PatientBagSplit): one segment per slide file,
            # concat order = groups order (== load_bag's concatenation)
            self._payloads = []
            for g in self.split.groups:
                parts = [_one(self.split.parent.bag_file(int(j))) for j in g]
                if any(p is None for p in parts) or len({p.dim for p in parts}) != 1:
                    self._payloads.append(None)
                else:
                    self._payloads.append(SegmentedPayload(
                        tuple(parts), sum(p.nrows for p in parts), parts[0].dim))
        return self._payloads

    def _bag_lengths(self) -> list | None:
        """Per-bag row counts from file metadata (no payload reads), or None
        when any bag is unresolvable."""
        if self._lengths is not False:
            return self._lengths
        payloads = self._resolve_payloads()
        if payloads is None or any(p is None for p in payloads):
            self._lengths = None
        else:
            self._lengths = [p.nrows for p in payloads]
        return self._lengths

    def _epoch_rng(self) -> np.random.RandomState:
        return np.random.RandomState((self.seed * 1_000_003 + self._epoch) % (2**31 - 1))

    def __len__(self) -> int:
        """Batch count for the CURRENT epoch (``set_epoch``): exact whenever
        bag lengths are resolvable from file metadata — bucket grouping is
        order-independent, and weighted/testing draws replay this epoch's
        rng stream. When lengths are unresolvable, falls back to
        ceil(n_bags/batch_size), which is a LOWER bound (bucket grouping can
        only split batches, never merge across buckets)."""
        order = self._order(self._epoch_rng())
        approx = (len(order) + self.batch_size - 1) // self.batch_size
        lengths = self._bag_lengths()
        if lengths is None:
            return approx
        counts: dict[int, int] = {}
        for i in order:
            n = lengths[int(i)]
            if self.max_bag_size is not None:
                n = min(n, self.max_bag_size)
            b = n if self.bucket_sizes is None else bucket_for(n, self.bucket_sizes)
            counts[b] = counts.get(b, 0) + 1
        return sum((c + self.batch_size - 1) // self.batch_size for c in counts.values())

    @property
    def n_bags(self) -> int:
        return len(self._order(np.random.RandomState(0)))

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _order(self, rng: np.random.RandomState) -> np.ndarray:
        n = len(self.split)
        if self.testing_frac is not None:
            ids = rng.choice(np.arange(n), int(n * self.testing_frac), replace=False)
            return np.sort(ids)
        if self.mode == "sequential":
            return np.arange(n)
        if self.mode == "shuffle":
            return rng.permutation(n)
        if self.mode == "weighted":
            w = self.split.class_weights()
            p = w / w.sum()
            return rng.choice(np.arange(n), size=n, replace=True, p=p)
        raise ValueError(f"unknown mode {self.mode!r}")

    def _load(self, i: int) -> tuple[int, np.ndarray]:
        feats = self.split.load_bag(int(i))
        feats = np.asarray(feats, dtype=np.float32)
        if feats.ndim != 2:
            raise ValueError(f"bag {i} has shape {feats.shape}, expected [N, D]")
        if self.max_bag_size is not None and feats.shape[0] > self.max_bag_size:
            feats = feats[: self.max_bag_size]
        return i, feats

    def _assemble(self, group: list[tuple[int, np.ndarray]], bucket: int) -> BagBatch:
        b = self.batch_size
        d = group[0][1].shape[1]
        feats = np.zeros((b, bucket, d), dtype=np.float32)
        pmask = np.zeros((b, bucket), dtype=np.float32)
        bmask = np.zeros((b,), dtype=np.float32)
        label = np.zeros((b,), dtype=np.int32)
        site = np.zeros((b,), dtype=np.int32)
        sex = np.zeros((b,), dtype=np.int32)
        idxs = np.full((b,), -1, dtype=np.int64)
        for j, (i, bag) in enumerate(group):
            feats[j], pmask[j] = _pad_bag(bag, bucket)
            bmask[j] = 1.0
            label[j] = self.split.labels[i]
            site[j] = self.split.sites[i]
            sex[j] = self.split.sexes[i]
            idxs[j] = i
        return BagBatch(feats, pmask, bmask, label, site, sex, idxs)

    # -- native zero-copy path -------------------------------------------------

    def _native_ready(self) -> bool:
        """True when every bag in the split resolves to a contiguous float32
        payload AND the C++ library is loadable."""
        if self.native == "off":
            return False
        if self.native_active is not None:
            return self.native_active
        from toad_tpu import native as native_lib
        from toad_tpu.data.native_bags import resolve_payload

        # Splits exposing neither per-bag files (bag_file) nor per-file
        # groups (PatientBagSplit's parent slides) are STRUCTURALLY
        # ineligible — documented automatic fallback, even under native='on'
        # (which forces native only where it CAN apply).
        if self._resolve_payloads() is None:
            self.native_active = False
            return False
        ok = native_lib.available()
        eligible = "unchecked"
        if ok:
            from toad_tpu.data.native_bags import Q8PayloadInfo, SegmentedPayload

            payloads = self._resolve_payloads()
            eligible = all(p is not None for p in payloads)
            # int8-STORE payloads (Q8PayloadInfo, incl. inside patient-bag
            # segments) read through natively only on the int8 wire; any
            # other wire needs the numpy dequant fallback
            if eligible and self.transfer_dtype != "int8":
                def _any_q8(p):
                    parts = p.parts if isinstance(p, SegmentedPayload) else (p,)
                    return any(isinstance(q, Q8PayloadInfo) for q in parts)

                eligible = not any(_any_q8(p) for p in payloads)
            # every bag must agree on the feature dim (and match feature_dim if
            # pinned) — a mixed-dim store must fail loudly in the numpy path,
            # not pread misaligned bytes here
            if eligible and payloads:
                dims = {p.dim for p in payloads}
                eligible = len(dims) == 1 and (self.feature_dim is None or dims == {self.feature_dim})
            ok = bool(eligible)  # payloads already cached by _resolve_payloads
        if not ok and self.native == "on":
            from toad_tpu.native import failure_reason

            raise RuntimeError(
                "native bag IO requested but unavailable "
                f"(lib: {failure_reason() or 'ok'}; all bags eligible: {eligible})"
            )
        self.native_active = ok
        return ok

    def _assemble_native(self, group: list[int], bucket: int) -> BagBatch:
        from toad_tpu import native as native_lib
        from toad_tpu.data.native_bags import Q8PayloadInfo, SegmentedPayload

        b = self.batch_size
        d = self._payloads[group[0]].dim
        pmask = np.zeros((b, bucket), dtype=np.float32)
        cap = bucket if self.max_bag_size is None else min(bucket, self.max_bag_size)
        # flatten bags to segments (one per contiguous on-disk payload; a
        # patient-concat bag contributes one per slide file at its cumulative
        # row offset), truncating at cap exactly like the numpy path's
        # max_bag_size clip of the concatenated bag. f32 segments take the
        # wire-fused packer (cast/quantize inside the C++ read); int8-STORE
        # segments (only reachable on the int8 wire — _native_ready) read
        # through raw. dst_rows make slot layout explicit, so the two packer
        # calls interleave freely.
        f32_segs: list = []  # (path, offset, take, dst_row)
        q8_segs: list = []  # (path, q_offset, s_offset, take, dst_row)
        for slot, i in enumerate(group):
            p = self._payloads[i]
            parts = p.parts if isinstance(p, SegmentedPayload) else (p,)
            r0 = 0
            for part in parts:
                take = min(part.nrows, cap - r0)
                if take <= 0:
                    break
                dst = slot * bucket + r0
                if isinstance(part, Q8PayloadInfo):
                    q8_segs.append((part.path, part.offset, part.scales_offset, take, dst))
                else:
                    f32_segs.append((part.path, part.offset, take, dst))
                r0 += take
        scales = None
        # The wire conversion is FUSED into the C++ read (one cache-hot
        # pass) — _convert sees the final dtype and passes through.
        if self.transfer_dtype == "int8":
            feats = np.zeros((b, bucket, d), dtype=np.int8)
            # q=0 rows (padding) are exact under any positive scale
            scales = np.full((b, bucket), 1.0 / 127.0, np.float32)
            if f32_segs:  # fused read + quantize
                native_lib.pack_segs_int8(
                    [s[0] for s in f32_segs],
                    np.array([s[1] for s in f32_segs], np.int64),
                    np.array([s[2] for s in f32_segs], np.int64),
                    np.array([s[3] for s in f32_segs], np.int64),
                    d, feats, scales, pmask, self.num_workers,
                )
            if q8_segs:  # int8-store: raw read-through of q + scales
                native_lib.pack_segs_q8(
                    [s[0] for s in q8_segs],
                    np.array([s[1] for s in q8_segs], np.int64),
                    np.array([s[2] for s in q8_segs], np.int64),
                    np.array([s[3] for s in q8_segs], np.int64),
                    np.array([s[4] for s in q8_segs], np.int64),
                    d, feats, scales, pmask, self.num_workers,
                )
        elif self.transfer_dtype == "bfloat16":
            import ml_dtypes

            feats = np.zeros((b, bucket, d), dtype=ml_dtypes.bfloat16)
            native_lib.pack_segs_bf16(
                [s[0] for s in f32_segs],
                np.array([s[1] for s in f32_segs], np.int64),
                np.array([s[2] for s in f32_segs], np.int64),
                np.array([s[3] for s in f32_segs], np.int64),
                d, feats.view(np.uint16), pmask, self.num_workers,
            )
        else:
            feats = np.zeros((b, bucket, d), dtype=np.float32)
            native_lib.pack_segs(
                [s[0] for s in f32_segs],
                np.array([s[1] for s in f32_segs], np.int64),
                np.array([s[2] for s in f32_segs], np.int64),
                np.array([s[3] for s in f32_segs], np.int64),
                d, feats, pmask, self.num_workers,
            )
        bmask = np.zeros((b,), dtype=np.float32)
        label = np.zeros((b,), dtype=np.int32)
        site = np.zeros((b,), dtype=np.int32)
        sex = np.zeros((b,), dtype=np.int32)
        idxs = np.full((b,), -1, dtype=np.int64)
        for j, i in enumerate(group):
            bmask[j] = 1.0
            label[j] = self.split.labels[i]
            site[j] = self.split.sites[i]
            sex[j] = self.split.sexes[i]
            idxs[j] = i
        return BagBatch(feats, pmask, bmask, label, site, sex, idxs, scales=scales)

    def _batches_native(self) -> Iterator[BagBatch]:
        order = self._order(self._epoch_rng())
        cap = self.max_bag_size
        pools: dict[int, list[int]] = {}
        for i in order:
            n = self._payloads[int(i)].nrows
            if cap is not None:
                n = min(n, cap)
            bucket = n if self.bucket_sizes is None else bucket_for(n, self.bucket_sizes)
            pools.setdefault(bucket, []).append(int(i))
            if len(pools[bucket]) == self.batch_size:
                yield self._assemble_native(pools.pop(bucket), bucket)
        for bucket in sorted(pools):
            if pools[bucket]:
                yield self._assemble_native(pools[bucket], bucket)

    # -- generic (numpy) path ---------------------------------------------------

    def _batches_raw(self) -> Iterator[BagBatch]:
        if self._native_ready():
            yield from self._batches_native()
            return
        order = self._order(self._epoch_rng())
        pools: dict[int, list[tuple[int, np.ndarray]]] = {}

        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            # bounded in-flight window, NOT ex.map over the whole epoch:
            # map holds every completed-but-unyielded bag, so a consumer
            # slower than disk would accumulate the epoch's bags in host
            # memory (0.5 GB each at 131k x 1024). FIFO keeps load order.
            from collections import deque

            idx_iter = iter(order)
            pending: deque = deque()

            def _submit_one() -> None:
                i = next(idx_iter, None)
                if i is not None:
                    pending.append(ex.submit(self._load, int(i)))

            for _ in range(2 * self.num_workers):
                _submit_one()
            while pending:
                i, feats = pending.popleft().result()
                _submit_one()
                n = feats.shape[0]
                if self.bucket_sizes is None:
                    bucket = n
                else:
                    bucket = bucket_for(n, self.bucket_sizes)
                pools.setdefault(bucket, []).append((i, feats))
                if len(pools[bucket]) == self.batch_size:
                    yield self._assemble(pools.pop(bucket), bucket)
            # flush partials, padded to full batch shape with bag_mask=0
            for bucket in sorted(pools):
                group = pools[bucket]
                if group:
                    yield self._assemble(group, bucket)

    def _convert(self, b: BagBatch) -> BagBatch:
        if self.transfer_dtype == "float32":
            return b
        if b.features.dtype != np.float32:
            return b  # native fused packer already emitted the wire dtype
        if self.transfer_dtype == "int8":
            # int8 wire for the quantized eval path: quantize per-row HERE in
            # the producer thread (4x fewer H2D bytes than f32 — the disk-fed
            # path is transfer-bound) instead of on device. quantize_rows_np
            # is the exact twin of the device-side quantize_rows in isolation;
            # inside the fused step graph XLA's division rewrite can shift
            # border values by 1 quant LSB (probability deltas < 0.01 — both
            # are valid quantizations of the same f32 rows; tests/test_int8).
            # Padding rows are all-zero -> q=0 exactly, any positive scale.
            from toad_tpu.ops.quantize import quantize_rows_np

            B, N, D = b.features.shape
            q = np.zeros((B, N, D), np.int8)
            s = np.full((B, N), 1.0 / 127.0, np.float32)
            for i in range(B):
                # quantize only the real rows (padding is TRAILING by
                # construction — _pad_bag/_assemble) so a just-over-bucket
                # bag doesn't double the abs/max/rint work on this 1-core
                # host; padding stays q=0 with an arbitrary positive scale
                # (exact — see quantize_rows_np's contract)
                n = int(b.patch_mask[i].sum())
                if n:
                    q[i, :n], s[i, :n] = quantize_rows_np(b.features[i, :n])
            b.features = q
            b.scales = s
            return b
        import ml_dtypes

        dt = np.dtype(ml_dtypes.bfloat16) if self.transfer_dtype == "bfloat16" else np.dtype(self.transfer_dtype)
        b.features = b.features.astype(dt)
        return b

    # single-batch HBM guard for producer-side placement: a prefetch queue of
    # depth d holds d+1 batches' device buffers; giant long-bag batches
    # (131k x 1024 bf16 x B ≈ GBs each) must not multiply in HBM, so those
    # fall back to dispatch-time transfer
    _DEVICE_PUT_MAX_BYTES = 512 * 1024 * 1024

    def _place(self, b: BagBatch) -> BagBatch:
        """Start the H2D transfer of the heavy payloads from the producer
        thread (``jax.device_put`` is async), so the relay copy overlaps the
        previous batch's device compute instead of serializing with it at
        jit-dispatch time. Small per-bag fields (label/site/sex/bag_mask/
        indices) stay host-resident — the eval pass reads them on host and a
        device round-trip would force a sync. Not used on mesh runs, where
        ``shard_batch`` owns placement."""
        if b.features.nbytes <= self._DEVICE_PUT_MAX_BYTES:
            import jax

            b.features = jax.device_put(b.features, self.device)
            b.patch_mask = jax.device_put(b.patch_mask, self.device)
            if b.scales is not None:
                b.scales = jax.device_put(b.scales, self.device)
        return b

    def __iter__(self) -> Iterator[BagBatch]:
        def src() -> Iterator[BagBatch]:
            # dtype conversion runs in the producer so the queued batches are
            # already half-size and the cast overlaps device compute
            it = map(self._convert, self._batches_raw())
            return map(self._place, it) if self.device_put else it

        if self.prefetch and self.prefetch > 0:
            yield from _prefetch_iter(src, self.prefetch)
        else:
            yield from src()


def _prefetch_iter(make_iter: Callable[[], Iterator], depth: int) -> Iterator:
    """Run an iterator in a background thread, keeping `depth` items ready.
    If the consumer abandons the generator (exception mid-epoch), the
    producer notices via a stop event and exits instead of blocking forever
    on the bounded queue (which leaked its thread pool)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    error: list[BaseException] = []
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in make_iter():
                if not _put(item):
                    return
        except BaseException as e:  # propagate into consumer
            error.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
