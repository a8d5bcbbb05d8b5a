"""Evaluation engine: checkpoint → per-slide predictions → metrics + CSVs.

Capability parity with the reference eval stack
(``utils/eval_utils_mtl_concat.py:19-177`` + ``eval_mtl_concat.py:108-149``):
partial ("strict=False") checkpoint restore, top-1/3/5 accuracy, per-class
OVR AUCs with macro/micro averaging, the per-slide dataframe schema
(``slide_id, sex, Y, Y_hat, site, site_hat, p_0..p_{C-1}, site_p``), and the
-1 sentinel when only one class is present (``:131-132,157-160``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

from toad_tpu.config import DEFAULT_BUCKETS, ModelConfig
from toad_tpu.data.batching import BagBatcher, resolve_transfer_dtype
from toad_tpu.evaluate.metrics import binary_auc, micro_ovr_auc, ovr_aucs, topk_accuracy
from toad_tpu.evaluate.runner import make_eval_step, run_eval_pass
from toad_tpu.models.toad_mil import ToadMIL


@dataclass
class EvalResult:
    df: pd.DataFrame
    cls_auc: float
    cls_aucs: np.ndarray
    cls_error: float
    site_auc: float
    site_error: float
    topk: dict[int, float]
    patient_results: dict[str, Any] = field(default_factory=dict)

    @property
    def cls_acc(self) -> float:
        return 1.0 - self.cls_error

    @property
    def site_acc(self) -> float:
        return 1.0 - self.site_error


def evaluate_split(
    model: ToadMIL,
    params,
    split,
    *,
    n_classes: int | None = None,
    micro_average: bool = False,
    batch_size: int = 1,
    bucket_sizes=None,
    max_bag_size: int | None = None,
    eval_step=None,
    int8: bool = False,
    transfer_dtype: str = "auto",
    device=None,
) -> EvalResult:
    """Run a full no-grad pass over `split` and assemble reference-schema outputs.

    ``device`` pins the whole pass (params and every batch) to one local
    device — the placement hook fold-parallel evaluation uses to run one fold
    per chip (``cli/evaluate.py --fold_devices``); ``None`` keeps JAX's
    default device."""
    n_classes = n_classes if n_classes is not None else model.config.n_classes
    if device is not None:
        import jax

        params = jax.device_put(params, device)
    # the int8 wire ships pre-quantized rows+scales, which only a step WE
    # build here knows how to consume — a caller-supplied eval_step (e.g. a
    # reused compiled f32 step) must keep getting float features, or it would
    # silently run the raw -127..127 integers through model.apply
    own_step = eval_step is None
    if transfer_dtype == "int8" and not (int8 and own_step):
        raise ValueError(
            "transfer_dtype='int8' requires int8=True with an engine-built step "
            "(a float step would consume the raw quantized integers)"
        )
    if own_step:
        eval_step = make_eval_step(model, int8=int8, params=params if int8 else None)
    batcher = BagBatcher(
        split,
        batch_size=batch_size,
        bucket_sizes=bucket_sizes if bucket_sizes is not None else DEFAULT_BUCKETS,
        mode="sequential",
        max_bag_size=max_bag_size,
        # producer-thread async H2D: overlaps the relay copy with the
        # previous batch's forward (single-device path; mesh eval goes
        # through run_eval_pass(put=...) which owns placement)
        device_put=True,
        device=device,
        # 'auto': int8 wire for quantized eval (rows quantized in the
        # producer thread — 4x fewer H2D bytes, same quantizer as the
        # on-device path); else bf16 wire when (and only when) the model
        # computes in bf16, where the host-side cast is numerically invisible.
        # Explicit 'bfloat16' with int8 ALSO resolves to the int8 wire:
        # shipping bf16 rows to an int8 step would double-round
        # (f32→bf16→int8), a combination the ≤1-LSB quantizer analysis does
        # not cover — quantizing straight from f32 in the producer is both
        # exact-per-analysis and fewer wire bytes.
        transfer_dtype=("int8" if int8 and own_step and transfer_dtype in ("auto", "bfloat16")
                        else resolve_transfer_dtype(transfer_dtype, model.config.compute_dtype)),
    )
    res = run_eval_pass(eval_step, params, batcher, n_classes)

    labels, probs = res["label"], res["y_prob"]
    # sentinel semantics of the reference (eval_utils:131-132, 157-160)
    if len(np.unique(labels)) <= 1:
        cls_auc, cls_aucs = -1.0, np.array([])
    elif n_classes == 2:
        cls_auc, cls_aucs = binary_auc(labels, probs[:, 1]), np.array([])
    else:
        cls_aucs = ovr_aucs(labels, probs, n_classes)
        cls_auc = micro_ovr_auc(labels, probs, n_classes) if micro_average else float(np.nanmean(cls_aucs))
    site_auc = -1.0 if len(np.unique(res["site"])) <= 1 else binary_auc(res["site"], res["site_prob"][:, 1])

    ks = (1, 3, 5) if n_classes > 5 else ((1, 3) if n_classes > 2 else (1,))
    topk = topk_accuracy(probs, labels, ks) if res["n"] else {k: float("nan") for k in ks}

    order = np.argsort(res["indices"], kind="stable")
    slide_ids = np.asarray(split.slide_ids)[res["indices"][order]]
    cols: dict[str, Any] = {
        "slide_id": slide_ids,
        "sex": res["sex"][order].astype(np.float64),
        "Y": labels[order].astype(np.float64),
        "Y_hat": res["y_hat"][order],
        "site": res["site"][order].astype(np.float64),
        "site_hat": res["site_hat"][order],
    }
    for c in range(n_classes):
        cols[f"p_{c}"] = probs[order, c]
    cols["site_p"] = res["site_prob"][order, 1]
    df = pd.DataFrame(cols)

    from toad_tpu.evaluate.runner import patient_results_from_pass

    patient_results = patient_results_from_pass(
        {"y_prob": probs[order], "label": labels[order], "site_prob": res["site_prob"][order], "site": res["site"][order]},
        slide_ids,
    )

    return EvalResult(
        df=df,
        cls_auc=float(cls_auc),
        cls_aucs=cls_aucs,
        cls_error=res["cls_error"],
        site_auc=float(site_auc),
        site_error=res["site_error"],
        topk=topk,
        patient_results=patient_results,
    )


def bootstrap_result_cis(
    res: EvalResult,
    n_classes: int,
    *,
    n_boot: int = 1000,
    seed: int = 1,
    alpha: float = 0.05,
    micro_average: bool = False,
) -> dict[str, dict[str, float]]:
    """Percentile-bootstrap CIs for an :class:`EvalResult`, resampling its
    per-slide dataframe (see :func:`toad_tpu.evaluate.metrics.bootstrap_cis`)."""
    from toad_tpu.evaluate.metrics import bootstrap_cis

    df = res.df
    probs = df[[f"p_{c}" for c in range(n_classes)]].to_numpy()
    return bootstrap_cis(
        df["Y"].to_numpy(),
        probs,
        df["site"].to_numpy(),
        df["site_p"].to_numpy(),
        preds=df["Y_hat"].to_numpy(),
        n_boot=n_boot,
        seed=seed,
        alpha=alpha,
        micro_average=micro_average,
    )


def evaluate_checkpoint(
    ckpt_path: str | Path,
    split,
    model_cfg: ModelConfig,
    *,
    micro_average: bool = False,
    batch_size: int = 1,
    max_bag_size: int | None = None,
    int8: bool = False,
    bucket_sizes=None,
    transfer_dtype: str = "auto",
    device=None,
) -> EvalResult:
    """Load a checkpoint (params-only, tolerant of extra state) and evaluate.

    Accepts an Orbax checkpoint directory OR a reference-trained torch
    ``s_{fold}_checkpoint.pt`` file (parsed natively), so a reference user's
    existing models dir evaluates as-is."""
    model = ToadMIL(model_cfg)
    import jax

    from toad_tpu.train.checkpoint import load_params_any

    params = load_params_any(ckpt_path, model_cfg, template=model.init(jax.random.PRNGKey(0)))
    return evaluate_split(
        model,
        params,
        split,
        micro_average=micro_average,
        batch_size=batch_size,
        max_bag_size=max_bag_size,
        int8=int8,
        bucket_sizes=bucket_sizes,
        # 'float32' reproduces the legacy wire exactly (bf16/int8 'auto'
        # picks can shift border values; see PARITY.md int8 wire note)
        transfer_dtype=transfer_dtype,
        device=device,
    )
