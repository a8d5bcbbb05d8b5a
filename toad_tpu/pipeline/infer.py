"""End-to-end slide inference: patches -> embed -> attention-pool -> predict.

Chains what the reference spreads over two repos (CLAM featurization, then
``eval_mtl_concat.py``) into one on-device path. Bags are padded to the
configured bucket sizes so repeated slides reuse a handful of compiled
programs (no per-slide recompilation), and attention scores come back for
heatmap rendering (:mod:`toad_tpu.pipeline.heatmap`).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from toad_tpu.config import ModelConfig
from toad_tpu.data.batching import _pad_bag, bucket_for
from toad_tpu.models.toad_mil import ToadMIL


class SlidePrediction(NamedTuple):
    """Per-slide outputs, mirroring the reference results dict
    (``model_toad.py:109-116``) plus ranked origins."""

    y_hat: int
    y_prob: np.ndarray  # [n_classes]
    site_hat: int
    site_prob: np.ndarray  # [2]
    attention: np.ndarray  # [N] raw origin-task attention over real patches
    site_attention: np.ndarray  # [N] raw site-task attention
    topk: list[tuple[int, float]]  # (class index, prob) best-first

    def top_labels(self, inv_label_dict: dict[int, str] | None, k: int = 3):
        out = []
        for idx, p in self.topk[:k]:
            name = inv_label_dict.get(idx, str(idx)) if inv_label_dict else str(idx)
            out.append((name, p))
        return out


class SlideInference:
    """Checkpoint-loaded MIL head with bucket-compiled forward passes."""

    def __init__(
        self,
        params: Any,
        model_cfg: ModelConfig,
        bucket_sizes: Sequence[int] | None = None,
        int8: bool = False,
        temperature: float = 1.0,
    ):
        """``temperature``: scale class logits by 1/T before softmax —
        plug in the T fitted by ``evaluate --calibrate``
        (:mod:`toad_tpu.evaluate.calibration`). Argmax/top-k order are
        invariant; only the reported confidences change. Site probabilities
        are left raw (the fitted T is for the origin head)."""
        self.model = ToadMIL(model_cfg)
        # commit params to device once: load_params_any returns host numpy
        # leaves, and a numpy tree passed to jit re-uploads over the (erratic)
        # H2D relay on every predict() — same rule as DynamicBatcher
        self.params = jax.device_put(params)
        self.int8 = int8
        if not temperature > 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        self.temperature = float(temperature)
        if bucket_sizes is None:
            from toad_tpu.config import DEFAULT_BUCKETS

            bucket_sizes = DEFAULT_BUCKETS
        self.buckets = tuple(sorted(bucket_sizes))

        if int8:
            # int8 MXU fast path: weights quantized once here, each bag's
            # rows quantized on host at predict() (halves H2D bytes too).
            # Heads/softmax stay f32 — see ops/quantize.py for the scheme
            # and measured +34% kernel gain.
            from toad_tpu.ops.quantize import quantize_pool_params

            self.qparams = jax.tree.map(jnp.asarray, quantize_pool_params(params))

            def fwd_q(params, qparams, xq, sx, mask, sex):
                out = self.model.apply_int8(params, qparams, xq, sx, mask, sex)
                return out.logits, out.site_logits, out.attention

            self._fwd_int8 = jax.jit(fwd_q)
        else:

            def fwd(params, feats, mask, sex):
                out = self.model.apply(params, feats, mask, sex, train=False)
                return out.logits, out.site_logits, out.attention

            self._fwd = jax.jit(fwd)

    @classmethod
    def from_checkpoint(cls, ckpt_path: str | os.PathLike, model_cfg: ModelConfig, **kw) -> "SlideInference":
        """Load either an Orbax checkpoint directory or a reference torch
        ``s_{fold}_checkpoint.pt`` file — sniffed by path type (one shared
        loading policy: :func:`toad_tpu.train.checkpoint.load_params_any`)."""
        from toad_tpu.train.checkpoint import load_params_any

        return cls(load_params_any(ckpt_path, model_cfg), model_cfg, **kw)

    def predict(self, features: np.ndarray, sex: int) -> SlidePrediction:
        """One bag [N, D] -> prediction. N is padded up to the nearest bucket;
        bags longer than the largest bucket are head-truncated to it (same
        policy as the training batcher)."""
        logits, site_logits, attention, n = self._run(self.params, features, sex)
        return self._finish(logits, site_logits, attention, n)

    def _run(self, params, features: np.ndarray, sex: int, qparams=None):
        """Raw forward for one bag with the given parameter tree. ``params``
        is a traced jit argument, so any same-shaped tree (another fold's
        checkpoint — :class:`EnsembleInference`) reuses this object's single
        compiled program."""
        bucket = bucket_for(int(features.shape[0]), self.buckets)
        feats32 = np.asarray(features, np.float32)
        n = min(int(feats32.shape[0]), bucket)  # real rows (attention slice)
        if self.int8:
            from toad_tpu.ops.quantize import quantize_rows_np

            # Quantize only the real (head-truncated) rows, THEN pad the int8
            # array — same policy as DynamicBatcher.submit/_assemble. Running
            # the host abs/max/rint pass over the zero padding would up to
            # double the work on this 1-core host for just-over-bucket bags.
            xq_rows, sx_rows = quantize_rows_np(feats32[:n])
            return self._run_quantized(params, xq_rows, sx_rows, sex, qparams=qparams)
        # the SAME pad/truncate policy as the training batcher, by construction
        bag, bag_mask = _pad_bag(feats32, bucket)
        if self.model.config.compute_dtype == "bfloat16":
            # bf16 wire (same rule as BagBatcher's transfer_dtype='auto'):
            # the model casts features to bf16 on device anyway, and the cast
            # is round-to-nearest-even either side — half the H2D bytes free
            import ml_dtypes

            bag = bag.astype(ml_dtypes.bfloat16)
        logits, site_logits, attention = self._fwd(
            params, jnp.asarray(bag[None]), jnp.asarray(bag_mask[None]),
            jnp.asarray([sex], jnp.int32)
        )
        return logits, site_logits, attention, n

    def predict_quantized(self, xq_rows: np.ndarray, sx_rows: np.ndarray, sex: int) -> SlidePrediction:
        """Pre-quantized rows [n, D] int8 + [n] f32 scales -> prediction,
        skipping the host quantization pass entirely (bags stored with
        ``data/bags.py::save_int8_bag`` feed this directly). int8 mode only."""
        logits, site_logits, attention, n = self._run_quantized(self.params, xq_rows, sx_rows, sex)
        return self._finish(logits, site_logits, attention, n)

    def _run_quantized(self, params, xq_rows: np.ndarray, sx_rows: np.ndarray, sex: int, qparams=None):
        if not self.int8:
            raise ValueError("predict_quantized requires SlideInference(int8=True)")
        bucket = bucket_for(int(xq_rows.shape[0]), self.buckets)
        n = min(int(xq_rows.shape[0]), bucket)
        xq = np.zeros((bucket, xq_rows.shape[1]), np.int8)
        xq[:n] = xq_rows[:n]
        sx = np.full((bucket,), 1.0 / 127.0, np.float32)
        sx[:n] = np.asarray(sx_rows[:n], np.float32)
        mask = np.zeros((1, bucket), np.float32)
        mask[0, :n] = 1.0
        logits, site_logits, attention = self._fwd_int8(
            params, self.qparams if qparams is None else qparams,
            jnp.asarray(xq[None]), jnp.asarray(sx[None]),
            jnp.asarray(mask), jnp.asarray([sex], jnp.int32)
        )
        return logits, site_logits, attention, n

    def _finish(self, logits, site_logits, attention, n: int) -> SlidePrediction:
        y_prob = np.asarray(jax.nn.softmax(np.asarray(logits[0]) / self.temperature))
        site_prob = np.asarray(jax.nn.softmax(site_logits[0]))
        # argmax for y_hat (ties -> lowest index, matching the eval engine's
        # jnp.argmax) + stable sort for the ranking, so predict() and batch
        # eval never disagree on tied probabilities
        order = np.argsort(-y_prob, kind="stable")
        attn = np.asarray(attention)
        return SlidePrediction(
            y_hat=int(y_prob.argmax()),
            y_prob=y_prob,
            site_hat=int(site_prob.argmax()),
            site_prob=site_prob,
            attention=attn[0, 0, :n],
            site_attention=attn[0, 1, :n],
            topk=[(int(i), float(y_prob[i])) for i in order],
        )


class EnsembleInference:
    """Average-of-folds ensemble: mean softmax over k fold checkpoints.

    The standard deployment pattern for a k-fold CV experiment — and one the
    reference cannot express: its eval loop runs one checkpoint per pass and
    only aggregates *metrics* across folds (``eval_mtl_concat.py:105,117-138``),
    never probabilities. Here every member shares ONE compiled forward (the
    parameter tree is a traced jit argument in :class:`SlideInference`), so an
    ensemble costs k dispatches of the same XLA program, zero extra compiles.

    Combination rule: per-member temperature-scaled class softmax, then the
    arithmetic mean; argmax/top-k rank the mean. Attention comes back as the
    mean of the members' softmaxed pooling weights over the real rows (raw
    attention logits are not comparable across members)."""

    def __init__(
        self,
        params_list: Sequence[Any],
        model_cfg: ModelConfig,
        bucket_sizes: Sequence[int] | None = None,
        int8: bool = False,
        temperature: float = 1.0,
    ):
        if not params_list:
            raise ValueError("EnsembleInference needs at least one checkpoint")
        self._inf = SlideInference(
            params_list[0], model_cfg, bucket_sizes=bucket_sizes, int8=int8,
            temperature=temperature,
        )
        # members live on device (same H2D rule as SlideInference.params);
        # member 0 reuses the inner SlideInference's already-quantized tree
        if int8:
            from toad_tpu.ops.quantize import quantize_pool_params

            self.members = [
                (
                    jax.device_put(p),
                    self._inf.qparams
                    if i == 0
                    else jax.tree.map(jnp.asarray, quantize_pool_params(p)),
                )
                for i, p in enumerate(params_list)
            ]
        else:
            self.members = [(jax.device_put(p), None) for p in params_list]

    @classmethod
    def from_checkpoints(
        cls, ckpt_paths: Sequence[str | os.PathLike], model_cfg: ModelConfig, **kw
    ) -> "EnsembleInference":
        """Each path may be an Orbax directory or a reference torch
        ``s_{fold}_checkpoint.pt`` (same sniffing as
        :meth:`SlideInference.from_checkpoint`)."""
        from toad_tpu.train.checkpoint import load_params_any

        return cls([load_params_any(p, model_cfg) for p in ckpt_paths], model_cfg, **kw)

    @classmethod
    def from_models_dir(
        cls, models_dir: str | os.PathLike, model_cfg: ModelConfig, **kw
    ) -> "EnsembleInference":
        """All ``s_{k}_checkpoint`` members found in a training results dir
        (the layout ``cli/train.py`` writes), sorted by fold index."""
        found = find_fold_checkpoints(models_dir)
        if not found:
            raise FileNotFoundError(f"no s_<k>_checkpoint members under {models_dir}")
        return cls.from_checkpoints([p for _, p in found], model_cfg, **kw)

    @classmethod
    def from_spec(
        cls, ckpt: str | os.PathLike, model_cfg: ModelConfig, **kw
    ) -> "EnsembleInference":
        """CLI ``--ckpt`` semantics shared by ``predict/infer --ensemble``:
        a path that exists on disk is a training results dir (every
        ``s_<k>_checkpoint`` becomes a member); otherwise a comma-separated
        list of member checkpoint paths. The existence check runs first so a
        directory whose *name* contains a comma is never misparsed as a
        list."""
        ckpt = os.fspath(ckpt)
        if "," in ckpt and not os.path.exists(ckpt):
            return cls.from_checkpoints(
                [s.strip() for s in ckpt.split(",") if s.strip()], model_cfg, **kw
            )
        return cls.from_models_dir(ckpt, model_cfg, **kw)

    # int8/buckets/temperature come from the shared SlideInference
    @property
    def int8(self) -> bool:
        return self._inf.int8

    @property
    def buckets(self):
        return self._inf.buckets

    def predict(self, features: np.ndarray, sex: int) -> SlidePrediction:
        runs = [self._inf._run(p, features, sex, qparams=qp) for p, qp in self.members]
        return self._combine(runs)

    def predict_quantized(self, xq_rows: np.ndarray, sx_rows: np.ndarray, sex: int) -> SlidePrediction:
        runs = [
            self._inf._run_quantized(p, xq_rows, sx_rows, sex, qparams=qp)
            for p, qp in self.members
        ]
        return self._combine(runs)

    def _combine(self, runs) -> SlidePrediction:
        preds = [self._inf._finish(lo, so, at, n) for lo, so, at, n in runs]
        y_prob = np.mean([p.y_prob for p in preds], axis=0)
        site_prob = np.mean([p.site_prob for p in preds], axis=0)

        def _mean_weights(key: str) -> np.ndarray:
            # softmax each member's raw attention over the real rows, then mean
            ws = []
            for p in preds:
                a = np.asarray(getattr(p, key), np.float64)
                a = np.exp(a - a.max())
                ws.append(a / a.sum())
            return np.mean(ws, axis=0)

        order = np.argsort(-y_prob, kind="stable")
        return SlidePrediction(
            y_hat=int(y_prob.argmax()),
            y_prob=y_prob,
            site_hat=int(site_prob.argmax()),
            site_prob=site_prob,
            attention=_mean_weights("attention"),
            site_attention=_mean_weights("site_attention"),
            topk=[(int(i), float(y_prob[i])) for i in order],
        )


def find_fold_checkpoints(models_dir: str | os.PathLike) -> list[tuple[int, "os.PathLike"]]:
    """``(fold, path)`` for every ``s_{k}_checkpoint[.pt]`` in a results dir,
    sorted by fold (the ``cli/train.py`` / reference layout —
    ``eval_mtl_concat.py:105``). When a fold has BOTH an Orbax directory and
    a torch ``.pt`` export (e.g. a reference dir converted in place), the
    Orbax one wins — the fold must appear once, or the ensemble mean would
    silently double-weight it."""
    import re
    from pathlib import Path

    best: dict[int, Path] = {}
    for p in Path(models_dir).iterdir():
        m = re.fullmatch(r"s_(\d+)_checkpoint(\.pt)?", p.name)
        if m:
            fold = int(m.group(1))
            cur = best.get(fold)
            if cur is None or (cur.name.endswith(".pt") and not m.group(2)):
                best[fold] = p
    return sorted(best.items())


def infer_patch_file(
    embedder,
    inference: SlideInference,
    patch_file: str | os.PathLike,
    sex: int,
) -> tuple[SlidePrediction, np.ndarray | None]:
    """Full chain for one slide: CLAM-style patch h5 -> features ->
    prediction. Returns (prediction, coords) for heatmap rendering."""
    from toad_tpu.pipeline.featurize import read_patch_file

    f, imgs, coords = read_patch_file(patch_file)
    try:
        feats = embedder.embed_all(imgs)
    finally:
        f.close()
    pred = inference.predict(feats, sex)
    return pred, _align_coords(coords, pred)


def infer_feature_bag(
    inference: SlideInference,
    bag_path: str | os.PathLike,
    sex: int,
) -> tuple[SlidePrediction, np.ndarray | None]:
    """Inference straight from a precomputed feature bag (.pt/.h5/.npy).
    int8-stored bags (``save_int8_bag``) feed the int8 path without a host
    requantization pass; in f32 mode they dequantize transparently."""
    from toad_tpu.data.bags import load_bag, load_bag_quantized

    if inference.int8:
        q = load_bag_quantized(bag_path)
        if q is not None:
            xq, sx, coords = q
            pred = inference.predict_quantized(xq, sx, sex)
            return pred, _align_coords(coords, pred)
    feats, coords = load_bag(bag_path, with_coords=True)
    pred = inference.predict(np.asarray(feats, np.float32), sex)
    return pred, _align_coords(coords, pred)


def _align_coords(coords: np.ndarray | None, pred: SlidePrediction) -> np.ndarray | None:
    """Keep coords in lockstep with the prediction's attention: predict()
    head-truncates bags longer than the largest bucket, and a coords array
    longer than the attention would corrupt attention-export h5s and crash
    heatmap rendering."""
    if coords is not None and len(coords) > len(pred.attention):
        coords = coords[: len(pred.attention)]
    return coords
