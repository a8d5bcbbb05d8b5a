"""Shared no-grad evaluation pass: jitted step + host-side metric assembly.

Used by both the trainer's epoch validation (reference ``validate``/``summary``
at ``core_utils_mtl_concat.py:262-427``) and the standalone eval engine, so
the two can never drift.
"""

from __future__ import annotations

import jax
import numpy as np
import optax

from toad_tpu.data.batching import BagBatch, BagBatcher
from toad_tpu.evaluate.metrics import binary_auc, ovr_aucs
from toad_tpu.models.toad_mil import ToadMIL


def batch_to_dict(b: BagBatch) -> dict[str, np.ndarray]:
    d = {
        "features": b.features,
        "patch_mask": b.patch_mask,
        "bag_mask": b.bag_mask,
        "label": b.label,
        "site": b.site,
        "sex": b.sex,
    }
    if b.scales is not None:  # int8 wire: rows pre-quantized in the producer
        d["scales"] = b.scales
    return d


def make_eval_step(model: ToadMIL, int8: bool = False, params=None):
    """``int8=True`` runs the quantized pooling fast path (``ops/quantize.py``):
    the pooling weights are quantized ONCE here (pass the restored ``params``),
    rows on device inside the step — the trunk GEMMs hit the MXU's int8 rate;
    heads/metrics stay f32. The returned step still takes ``(params, batch)``."""
    if int8:
        from toad_tpu.ops.quantize import quantize_pool_params, quantize_rows

        if params is None:
            raise ValueError("int8 eval needs the restored params at step-build time")
        # hoisted: re-deriving ~1.3M quantized weight elements per batch inside
        # the compiled step would be pure waste; this also surfaces the
        # ungated-model ValueError at setup instead of first-trace time
        qp = jax.tree.map(jax.numpy.asarray, quantize_pool_params(params))
        build_params = params

        def step_int8(p, b):
            # the quantized trunk weights were frozen from the build-time
            # params; silently mixing them with different heads would produce
            # wrong probabilities — enforce the invariant instead
            if p is not build_params:
                raise ValueError(
                    "int8 eval step must be called with the same params object it "
                    "was built from (build a new step per checkpoint)"
                )
            return step_q(p, qp, b)

        @jax.jit
        def step_q(params, qp, batch):
            if "scales" in batch:  # int8 wire: producer already quantized
                xq, sx = batch["features"], batch["scales"]
            else:
                xq, sx = quantize_rows(batch["features"])
            out = model.apply_int8(
                params, qp, xq, sx, batch["patch_mask"], batch["sex"], need_attention=False
            )
            return _step_outputs(out, batch)

        return step_int8

    @jax.jit
    def step(params, batch):
        out = model.apply(
            params, batch["features"], batch["patch_mask"], batch["sex"],
            train=False, need_attention=False,  # eval discards attention; lets Pallas skip the [B,T,N] HBM write
        )
        return _step_outputs(out, batch)

    return step


def _step_outputs(out, batch):
    cls_ce = optax.softmax_cross_entropy_with_integer_labels(out.logits, batch["label"])
    site_ce = optax.softmax_cross_entropy_with_integer_labels(out.site_logits, batch["site"])
    return {
        "y_prob": out.y_prob,
        "y_hat": out.y_hat,
        "site_prob": out.site_prob,
        "site_hat": out.site_hat,
        "cls_ce": cls_ce,
        "site_ce": site_ce,
    }


def run_eval_pass(eval_step, params, batcher: BagBatcher, n_classes: int, put=None):
    """One no-grad pass: per-slide probs/preds + mean losses + AUCs on host.

    `put` optionally device-puts each host batch with mesh shardings."""
    probs, labels, sites, site_probs, preds, site_preds, sexes, indices = [], [], [], [], [], [], [], []
    cls_loss_sum = 0.0
    site_loss_sum = 0.0
    n_total = 0
    for b in batcher:
        bd = batch_to_dict(b)
        out = eval_step(params, put(bd) if put is not None else bd)
        keep = b.bag_mask > 0
        out = jax.tree.map(np.asarray, out)
        probs.append(out["y_prob"][keep])
        site_probs.append(out["site_prob"][keep])
        preds.append(out["y_hat"][keep])
        site_preds.append(out["site_hat"][keep])
        labels.append(b.label[keep])
        sites.append(b.site[keep])
        sexes.append(b.sex[keep])
        indices.append(b.indices[keep])
        cls_loss_sum += float(out["cls_ce"][keep].sum())
        site_loss_sum += float(out["site_ce"][keep].sum())
        n_total += int(keep.sum())

    probs = np.concatenate(probs) if probs else np.zeros((0, n_classes))
    res = {
        "y_prob": probs,
        "site_prob": np.concatenate(site_probs) if site_probs else np.zeros((0, 2)),
        "y_hat": np.concatenate(preds) if preds else np.zeros((0,), np.int32),
        "site_hat": np.concatenate(site_preds) if site_preds else np.zeros((0,), np.int32),
        "label": np.concatenate(labels) if labels else np.zeros((0,), np.int32),
        "site": np.concatenate(sites) if sites else np.zeros((0,), np.int32),
        "sex": np.concatenate(sexes) if sexes else np.zeros((0,), np.int32),
        "indices": np.concatenate(indices) if indices else np.zeros((0,), np.int64),
        "n": n_total,
        "cls_loss": cls_loss_sum / max(n_total, 1),
        "site_loss": site_loss_sum / max(n_total, 1),
    }
    res["cls_error"] = float(1.0 - (res["y_hat"] == res["label"]).mean()) if n_total else 1.0
    res["site_error"] = float(1.0 - (res["site_hat"] == res["site"]).mean()) if n_total else 1.0
    if n_total:
        if n_classes == 2:
            res["cls_auc"] = binary_auc(res["label"], res["y_prob"][:, 1])
            res["cls_aucs"] = np.array([])
        else:
            res["cls_aucs"] = ovr_aucs(res["label"], res["y_prob"], n_classes)
            res["cls_auc"] = float(np.nanmean(res["cls_aucs"]))
        res["site_auc"] = binary_auc(res["site"], res["site_prob"][:, 1])
    else:
        res["cls_auc"] = float("nan")
        res["cls_aucs"] = np.array([])
        res["site_auc"] = float("nan")
    return res


def patient_results_from_pass(res: dict, slide_ids) -> dict:
    """Reference-style per-slide results dict (``core_utils_mtl_concat.py:
    368-427`` summary). Row i of ``res`` must correspond to ``slide_ids[i]``.
    The ONE schema shared by FoldTrainer's final summary and the eval engine."""
    out = {}
    for i, sid in enumerate(slide_ids):
        sid = str(sid)
        out[sid] = {
            "slide_id": sid,
            "cls_prob": res["y_prob"][i : i + 1],
            "cls_label": int(res["label"][i]),
            "site_prob": res["site_prob"][i : i + 1],
            "site_label": int(res["site"][i]),
        }
    return out
