"""Per-fold training: jitted update/eval steps, early stopping, checkpoints.

Orchestration parity with the reference trainer
(``utils/core_utils_mtl_concat.py:87-187``): loss = 0.75·CE(origin) +
0.25·CE(site) (``:215``), early stopping on the cls val loss with
patience 20 / earliest epoch 50 (``:44-85,358-364``), best-checkpoint
restore, and the same final summaries. TPU-native differences:

- the whole update is one jitted function over a padded batch of bags; the
  only per-epoch host transfers are the scalar metric sums and (for val)
  the probability matrix for AUC;
- gradients/optimizer state are donated, so params update in place on HBM;
- per-class tallies are computed on device as one segment-sum, not a Python
  dict per bag (reference ``Accuracy_Logger.log`` per slide).
"""

from __future__ import annotations

import functools
import os
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from toad_tpu.config import TrainConfig
from toad_tpu.data.batching import BagBatch, BagBatcher, resolve_transfer_dtype
from toad_tpu.data.splits import save_split_columnar
from toad_tpu.evaluate.metrics import AccuracyLogger
from toad_tpu.evaluate.runner import batch_to_dict as _to_batch_dict
from toad_tpu.evaluate.runner import make_eval_step, run_eval_pass
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.train.checkpoint import checkpoint_name, recover_checkpoint, restore_checkpoint, save_checkpoint
from toad_tpu.train.optim import make_optimizer


class HostRssWatermark(RuntimeError):
    """Raised at an epoch boundary when host RSS crosses
    ``TrainConfig.rss_restart_gb``, AFTER a fresh resume snapshot was saved.

    The process is expected to re-exec itself and resume (``cli/train.py``
    does; so does ``experiments/fixture_parity.py``): in-process recovery is
    impossible because the leaked memory belongs to the platform's transfer
    client, not to Python (measured: the axon TPU relay client permanently
    leaks every H2D/D2H byte host-side — a fixture-scale training run was
    OOM-killed at 130 GB RSS in round 5)."""

    def __init__(self, rss_gb: float, limit_gb: float, epoch: int):
        self.rss_gb, self.limit_gb, self.epoch = rss_gb, limit_gb, epoch
        super().__init__(
            f"host RSS {rss_gb:.1f} GiB >= rss_restart_gb {limit_gb:.1f} after epoch "
            f"{epoch}; resume snapshot saved — re-exec this process and resume"
        )


def _ce_with_ints(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def make_loss_fn(model: ToadMIL, cls_w: float, site_w: float):
    def loss_fn(params, batch: dict[str, jax.Array], rng):
        out = model.apply(
            params,
            batch["features"],
            batch["patch_mask"],
            batch["sex"],
            train=True,
            rng=rng,
        )
        bag_mask = batch["bag_mask"]
        n = jnp.maximum(bag_mask.sum(), 1.0)
        # zero out labels on padding rows BEFORE the CE: an out-of-range label
        # there would make take_along_axis fill NaN, and NaN * mask0 is still
        # NaN — masking by multiplication alone can't contain it
        label = jnp.where(bag_mask > 0, batch["label"], 0)
        site = jnp.where(bag_mask > 0, batch["site"], 0)
        cls_ce = (_ce_with_ints(out.logits, label) * bag_mask).sum() / n
        site_ce = (_ce_with_ints(out.site_logits, site) * bag_mask).sum() / n
        loss = cls_w * cls_ce + site_w * site_ce
        aux = {
            "cls_loss": cls_ce,
            "site_loss": site_ce,
            "y_hat": out.y_hat,
            "site_hat": out.site_hat,
        }
        return loss, aux

    return loss_fn


def make_train_step(model: ToadMIL, tx: optax.GradientTransformation, cls_w: float, site_w: float):
    loss_fn = make_loss_fn(model, cls_w, site_w)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        bag_mask = batch["bag_mask"]
        metrics = {
            "loss": loss,
            "cls_loss_sum": aux["cls_loss"] * bag_mask.sum(),
            "site_loss_sum": aux["site_loss"] * bag_mask.sum(),
            "n_bags": bag_mask.sum(),
            "cls_correct": ((aux["y_hat"] == batch["label"]) * bag_mask).sum(),
            "site_correct": ((aux["site_hat"] == batch["site"]) * bag_mask).sum(),
            "y_hat": aux["y_hat"],
            "site_hat": aux["site_hat"],
        }
        return params, opt_state, metrics

    return step


class EarlyStopping:
    """Patience-based stopping on val loss (reference ``:44-85``): stops after
    `patience` non-improvements, but never before epoch `stop_epoch`."""

    def __init__(self, patience: int = 20, stop_epoch: int = 50):
        self.patience = patience
        self.stop_epoch = stop_epoch
        self.counter = 0
        self.best: float | None = None
        self.early_stop = False

    def __call__(self, epoch: int, val_loss: float) -> bool:
        """Returns True when this epoch's state should be checkpointed."""
        # ties count as improvements, like the reference (score < best_score
        # is the only non-improving branch, core_utils:70-76)
        improved = self.best is None or val_loss <= self.best
        if improved:
            self.best = val_loss
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience and epoch > self.stop_epoch:
            self.early_stop = True
        return False

    def state_dict(self) -> dict[str, Any]:
        return {
            "counter": np.int64(self.counter),
            "best": np.float64(np.inf if self.best is None else self.best),
            "early_stop": np.int64(self.early_stop),
        }

    def load_state_dict(self, d: dict[str, Any]) -> None:
        self.counter = int(d["counter"])
        best = float(d["best"])
        self.best = None if np.isinf(best) else best
        self.early_stop = bool(d["early_stop"])


class FoldTrainer:
    """Owns one fold end-to-end (reference ``train``, ``core_utils:87-187``)."""

    def __init__(self, cfg: TrainConfig, fold: int, results_dir: str | os.PathLike, writer=None, mesh=None,
                 device=None):
        self.cfg = cfg
        self.fold = fold
        self.results_dir = Path(results_dir)
        self.results_dir.mkdir(parents=True, exist_ok=True)
        self.writer = writer
        # pin this fold's whole computation to one local device (fold-parallel
        # CV: train/parallel_folds.py runs one fold per chip). Mutually
        # exclusive with mesh sharding, which owns placement itself.
        if device is not None and (mesh is not None or cfg.data_shards * cfg.bag_shards > 1):
            raise ValueError("device= (fold-parallel) cannot combine with mesh/data_shards/bag_shards")
        self.device = device
        self.model = ToadMIL(cfg.model)
        self.tx = make_optimizer(cfg.optim)
        if cfg.debug_checks:
            from toad_tpu.utils.debug import make_checked_step

            self.train_step = make_checked_step(self.model, self.tx, cfg.cls_loss_weight, cfg.site_loss_weight)
        else:
            self.train_step = make_train_step(self.model, self.tx, cfg.cls_loss_weight, cfg.site_loss_weight)
        self.eval_step = make_eval_step(self.model)
        if mesh is None and cfg.data_shards * cfg.bag_shards > 1:
            from toad_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.data_shards, cfg.bag_shards)
        self.mesh = mesh
        if mesh is not None:
            from toad_tpu.parallel.sharding import shard_batch

            self._put = lambda bd: shard_batch(bd, mesh)
        else:
            self._put = None

    def _batcher(self, split, training: bool) -> BagBatcher:
        d = self.cfg.data
        if d.transfer_dtype == "int8":
            # int8 is an EVAL wire (evaluate_split int8=True): the train step
            # has no dequant path, so int8 rows would silently train on
            # unscaled integers — refuse instead
            raise ValueError("transfer_dtype='int8' is eval-only; training supports 'auto'/'float32'/'bfloat16'")
        mode = ("weighted" if d.weighted_sample else "shuffle") if training else "sequential"
        return BagBatcher(
            split,
            batch_size=d.batch_size,
            bucket_sizes=d.bucket_sizes,
            mode=mode,
            seed=self.cfg.seed + self.fold * 1009,
            testing_frac=(d.testing_frac if training and d.testing_frac else None),
            max_bag_size=d.max_bag_size,
            prefetch=d.prefetch,
            native=d.native,
            # 'auto' resolves to bf16 transfer only when the model computes
            # in bf16 (then host-side casting is numerically invisible)
            transfer_dtype=resolve_transfer_dtype(d.transfer_dtype, self.cfg.model.compute_dtype),
            # unmeshed runs: start H2D in the producer thread so transfer
            # overlaps the previous step; mesh runs place via shard_batch
            device_put=self.mesh is None,
            device=self.device,
        )

    @property
    def ckpt_path(self) -> Path:
        return self.results_dir / checkpoint_name(self.fold)

    @property
    def resume_path(self) -> Path:
        return self.results_dir / f"s_{self.fold}_resume"

    def _save_resume(self, params, opt_state, rng, epoch, stopper, best_saved: bool) -> None:
        state = {
            "params": params,
            "opt_state": opt_state,
            "rng": np.asarray(rng),
            "epoch": np.int64(epoch),
            "best_saved": np.int64(best_saved),
        }
        if stopper is not None:
            state["stopper"] = stopper.state_dict()
        save_checkpoint(self.resume_path, state)

    def train(self, train_split, val_split, test_split, log_fn: Callable[[str], None] = print):
        cfg = self.cfg
        if cfg.rss_restart_gb is not None and not cfg.resume:
            raise ValueError(
                "rss_restart_gb requires resume=True — a watermark restart "
                "without resume snapshots would lose all training progress"
            )
        n_classes = cfg.model.n_classes

        save_split_columnar(
            {
                "train": list(train_split.slide_ids),
                "val": list(val_split.slide_ids),
                "test": list(test_split.slide_ids),
            },
            self.results_dir / f"splits_{self.fold}.csv",
        )

        if cfg.data.patient_bags:
            # wrap ONCE here so indices, ids, and labels stay patient-level
            # everywhere downstream (batching, eval passes, patient_results);
            # the snapshot above stays slide-level for reproducibility
            from toad_tpu.data.wsi_dataset import PatientBagSplit

            train_split = PatientBagSplit(train_split)
            val_split = PatientBagSplit(val_split)
            test_split = PatientBagSplit(test_split)

        # every fold starts from the same seed — reference semantics: it
        # re-seeds with args.seed before EACH fold (main_mtl_concat.py:48)
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_key = jax.random.split(rng)
        params = self.model.init(init_key)
        opt_state = self.tx.init(params)
        if self.device is not None:
            # commit the whole training state in one tree: optax scalars
            # (e.g. adam's count) are created on the default device, and a
            # mixed-device state would fail jit dispatch on this fold's chip
            params, opt_state, rng = jax.device_put((params, opt_state, rng), self.device)
        if self.mesh is not None:
            from toad_tpu.parallel.sharding import replicate

            params = replicate(self.mesh, params)
            opt_state = replicate(self.mesh, opt_state)
        log_fn(
            f"[fold {self.fold}] model params: {self.model.param_count(params):,} | "
            f"train {len(train_split)} / val {len(val_split)} / test {len(test_split)} slides"
        )

        from toad_tpu.utils.profiling import StepTracer

        tracer = StepTracer(cfg.profile_dir, n_steps=10)
        train_batcher = self._batcher(train_split, training=True)
        val_batcher = self._batcher(val_split, training=False)
        test_batcher = self._batcher(test_split, training=False)

        stopper = EarlyStopping(cfg.patience, cfg.min_stop_epoch) if cfg.early_stopping else None
        best_saved = False
        start_epoch = 0

        if cfg.resume and recover_checkpoint(self.resume_path) is not None:
            template = {
                "params": jax.tree.map(np.asarray, params),
                "opt_state": jax.tree.map(np.asarray, opt_state),
                "rng": np.asarray(rng),
                "epoch": np.int64(0),
                "best_saved": np.int64(0),
            }
            if stopper is not None:
                template["stopper"] = stopper.state_dict()
            # orbax wants array leaves, not bare numpy scalars
            template = jax.tree.map(np.asarray, template)
            state = restore_checkpoint(self.resume_path, template)
            params = state["params"]
            opt_state = state["opt_state"]
            rng = jnp.asarray(state["rng"])
            start_epoch = int(state["epoch"]) + 1
            best_saved = bool(state["best_saved"])
            if stopper is not None and "stopper" in state:
                stopper.load_state_dict(state["stopper"])
            if self.mesh is not None:
                from toad_tpu.parallel.sharding import replicate

                params = replicate(self.mesh, params)
                opt_state = replicate(self.mesh, opt_state)
            if self.device is not None:
                params, opt_state, rng = jax.device_put((params, opt_state, rng), self.device)
            log_fn(f"[fold {self.fold}] resumed from epoch {start_epoch - 1} ({self.resume_path})")

        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.perf_counter()
            train_batcher.set_epoch(epoch)
            cls_logger = AccuracyLogger(n_classes)
            site_logger = AccuracyLogger(2)
            sums = {"cls_loss_sum": 0.0, "site_loss_sum": 0.0, "n_bags": 0.0, "cls_correct": 0.0, "site_correct": 0.0}
            t_data = 0.0  # host time blocked on the input pipeline (SURVEY §5 tracing row)
            t_fetch = time.perf_counter()
            for b in train_batcher:
                t_data += time.perf_counter() - t_fetch
                rng, step_key = jax.random.split(rng)
                bd = _to_batch_dict(b)
                if self._put is not None:
                    bd = self._put(bd)
                params, opt_state, metrics = self.train_step(params, opt_state, step_key, bd)
                tracer.step()
                metrics = jax.tree.map(np.asarray, metrics)
                for k in sums:
                    sums[k] += float(metrics[k])
                cls_logger.log_batch(metrics["y_hat"], b.label, b.bag_mask)
                site_logger.log_batch(metrics["site_hat"], b.site, b.bag_mask)
                t_fetch = time.perf_counter()

            tracer.stop()
            n = max(sums["n_bags"], 1.0)
            tr_cls_loss = sums["cls_loss_sum"] / n
            tr_cls_err = 1.0 - sums["cls_correct"] / n
            dt = time.perf_counter() - t0
            data_frac = t_data / max(dt, 1e-9)
            log_fn(
                f"[fold {self.fold}] epoch {epoch}: train cls_loss {tr_cls_loss:.4f} "
                f"err {tr_cls_err:.4f} | {n / dt:.1f} slides/s (data wait {data_frac:.0%})"
            )
            self._write_scalars(
                "train",
                epoch,
                {
                    "cls_loss": tr_cls_loss,
                    "cls_error": tr_cls_err,
                    "site_loss": sums["site_loss_sum"] / n,
                    "site_error": 1.0 - sums["site_correct"] / n,
                    "data_wait_frac": data_frac,
                },
                cls_logger,
                site_logger,
            )

            val = run_eval_pass(self.eval_step, params, val_batcher, n_classes, put=self._put)
            log_fn(
                f"[fold {self.fold}] epoch {epoch}: val cls_loss {val['cls_loss']:.4f} "
                f"err {val['cls_error']:.4f} auc {val['cls_auc']:.4f} site auc {val['site_auc']:.4f}"
            )
            # per-class TPR tallies for the val tag schema the reference
            # emits every epoch (core_utils_mtl_concat.py:345-356)
            val_cls_logger = AccuracyLogger(n_classes)
            val_cls_logger.log_batch(val["y_hat"], val["label"])
            val_site_logger = AccuracyLogger(2)
            val_site_logger.log_batch(val["site_hat"], val["site"])
            self._write_scalars(
                "val",
                epoch,
                {
                    "cls_loss": val["cls_loss"],
                    "cls_auc": val["cls_auc"],
                    "cls_error": val["cls_error"],
                    "site_loss": val["site_loss"],
                    "site_auc": val["site_auc"],
                    "site_error": val["site_error"],
                },
                val_cls_logger,
                val_site_logger,
            )

            if stopper is not None:
                if stopper(epoch, val["cls_loss"]):
                    save_checkpoint(self.ckpt_path, {"params": params, "epoch": np.int64(epoch)})
                    best_saved = True
                if stopper.early_stop:
                    log_fn(f"[fold {self.fold}] early stopping at epoch {epoch}")
                    break

            if cfg.resume and (epoch + 1) % cfg.resume_every == 0:
                self._save_resume(params, opt_state, rng, epoch, stopper, best_saved)

            if cfg.rss_restart_gb is not None:
                from toad_tpu.utils.profiling import host_rss_gb

                rss = host_rss_gb()
                if rss >= cfg.rss_restart_gb:
                    # snapshot NOW (resume_every may not have fired this
                    # epoch) so the re-exec'd process loses nothing
                    self._save_resume(params, opt_state, rng, epoch, stopper, best_saved)
                    log_fn(
                        f"[fold {self.fold}] host RSS {rss:.1f} GiB >= "
                        f"{cfg.rss_restart_gb:.1f} — snapshotting for restart"
                    )
                    raise HostRssWatermark(rss, cfg.rss_restart_gb, epoch)

        if stopper is not None and best_saved:
            state = restore_checkpoint(self.ckpt_path, {"params": params, "epoch": np.int64(0)})
            # restore returns host numpy leaves: commit them back to device
            # (replicated over the mesh when present) so the final val/test
            # passes don't re-upload the parameter tree on every batch
            if self.mesh is not None:
                from toad_tpu.parallel.sharding import replicate

                params = replicate(self.mesh, state["params"])
            else:
                params = jax.device_put(state["params"], self.device)
        else:
            save_checkpoint(self.ckpt_path, {"params": params, "epoch": np.int64(cfg.max_epochs - 1)})

        val = run_eval_pass(self.eval_step, params, val_batcher, n_classes, put=self._put)
        test = run_eval_pass(self.eval_step, params, test_batcher, n_classes, put=self._put)
        log_fn(
            f"[fold {self.fold}] FINAL val: err {val['cls_error']:.4f} auc {val['cls_auc']:.4f} | "
            f"test: err {test['cls_error']:.4f} auc {test['cls_auc']:.4f}"
        )

        from toad_tpu.evaluate.runner import patient_results_from_pass

        patient_results = patient_results_from_pass(
            test, [test_split.slide_ids[int(idx)] for idx in test["indices"]]
        )

        if self.writer is not None:
            for key, v in (
                ("final/cls_val_error", val["cls_error"]),
                ("final/cls_val_auc", val["cls_auc"]),
                ("final/site_val_error", val["site_error"]),
                ("final/site_val_auc", val["site_auc"]),
                ("final/cls_test_error", test["cls_error"]),
                ("final/cls_test_auc", test["cls_auc"]),
                ("final/site_test_error", test["site_error"]),
                ("final/site_test_auc", test["site_auc"]),
            ):
                self.writer.add_scalar(key, v, 0)

        # Only now is the snapshot obsolete: the final restore + val/test
        # sweeps above can take minutes under contended first-touch compiles,
        # and a preemption in that window must still resume, not retrain.
        if cfg.resume and recover_checkpoint(self.resume_path) is not None:
            import shutil

            shutil.rmtree(self.resume_path)

        return {
            "results": patient_results,
            "cls_test_auc": test["cls_auc"],
            "cls_val_auc": val["cls_auc"],
            "cls_test_acc": 1.0 - test["cls_error"],
            "cls_val_acc": 1.0 - val["cls_error"],
            "site_test_auc": test["site_auc"],
            "site_val_auc": val["site_auc"],
            "site_test_acc": 1.0 - test["site_error"],
            "site_val_acc": 1.0 - val["site_error"],
            "params": params,
            "val": val,
            "test": test,
        }

    def _write_scalars(self, prefix: str, epoch: int, scalars: dict[str, float], cls_logger=None, site_logger=None):
        if self.writer is None:
            return
        for k, v in scalars.items():
            self.writer.add_scalar(f"{prefix}/{k}", v, epoch)
        if cls_logger is not None:
            for c in range(cls_logger.n_classes):
                acc, _, _ = cls_logger.get_summary(c)
                if acc is not None:
                    self.writer.add_scalar(f"{prefix}/class_{c}_tpr", acc, epoch)
        if site_logger is not None:
            for c in range(2):
                acc, _, _ = site_logger.get_summary(c)
                if acc is not None:
                    self.writer.add_scalar(f"{prefix}/site_{c}_tpr", acc, epoch)


def train_fold(cfg: TrainConfig, fold: int, splits, results_dir, writer=None, log_fn=print):
    trainer = FoldTrainer(cfg, fold, results_dir, writer)
    return trainer.train(*splits, log_fn=log_fn)
