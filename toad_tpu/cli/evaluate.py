"""``python -m toad_tpu.cli.evaluate`` — checkpoint evaluation over folds.

Flag parity with the reference ``eval_mtl_concat.py:19-39``; writes
``eval_results/EVAL_{save_exp_code}/fold_{k}.csv`` + ``summary.csv`` with the
reference's schema (``eval_mtl_concat.py:108-149``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from toad_tpu.cli.common import add_buckets_arg, add_task_arg, build_dataset, echo_settings, require_data_root, resolve_buckets
from toad_tpu.config import ModelConfig, fold_range
from toad_tpu.evaluate.engine import evaluate_checkpoint
from toad_tpu.train.checkpoint import checkpoint_name


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TOAD-TPU evaluation")
    add_task_arg(p)
    p.add_argument("--data_root_dir", type=str, default=None)
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument("--save_exp_code", type=str, default=None)
    p.add_argument("--models_exp_code", type=str, default=None)
    p.add_argument("--splits_dir", type=str, default=None)
    p.add_argument("--drop_out", action="store_true", default=False)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--k_start", type=int, default=-1)
    p.add_argument("--k_end", type=int, default=-1)
    p.add_argument("--fold", type=int, default=-1)
    p.add_argument("--micro_average", action="store_true", default=False)
    p.add_argument("--split", type=str, choices=["train", "val", "test", "all"], default="test")
    p.add_argument("--encoding_size", type=int, default=1024, help="patch feature dimension")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_bag_size", type=int, default=None)
    add_buckets_arg(p, auto=True)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--pallas", action="store_true", default=False)
    p.add_argument("--int8", action="store_true", default=False,
                   help="quantized pooling fast path (int8 MXU GEMMs; heads/metrics stay f32; "
                   "bags quantize in the loader thread and cross host->device as int8 — 4x fewer bytes)")
    p.add_argument("--transfer_dtype", type=str, default="auto",
                   choices=["auto", "float32", "bfloat16", "int8"],
                   help="host->device feature wire. 'auto': int8 with --int8, bf16 with --bf16, else f32. "
                   "'float32' reproduces legacy (pre-wire) numbers exactly")
    p.add_argument("--patient_bags", action="store_true", default=False, help="concat each patient's slides into one bag")
    p.add_argument("--bootstrap", type=int, default=0, metavar="N",
                   help="N slide-resampling bootstrap draws -> 95%% CIs for the headline "
                        "metrics, written to fold_{k}_ci.json (the paper reports CIs; "
                        "the reference repo computes none)")
    p.add_argument("--calibrate", action="store_true", default=False,
                   help="fit temperature scaling on the fold's val split and report "
                        "ECE/NLL before/after on the evaluated split "
                        "(fold_{k}_calibration.json); argmax/top-k are unchanged")
    p.add_argument("--ensemble", action="store_true", default=False,
                   help="also score the mean-of-folds ensemble (per-slide average of the "
                        "folds' class/site probabilities): writes ensemble.csv and appends an "
                        "'ensemble' row to summary.csv. Requires --split all, so every fold "
                        "scores the same slides (per-fold test splits are disjoint)")
    p.add_argument("--fold_devices", type=int, default=1, metavar="N",
                   help="evaluate folds concurrently, one per local device (N devices; "
                        "-1 = all). Per-fold outputs are identical to the sequential run; "
                        "fold log blocks flush atomically in completion order")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    if args.save_exp_code is None:
        # never write to EVAL_None: the models code is the natural identity
        if args.models_exp_code is None:
            raise SystemExit("one of --save_exp_code / --models_exp_code is required")
        args.save_exp_code = f"{args.models_exp_code}_eval"
    require_data_root(args)
    task, dataset = build_dataset(args, data_dir=args.data_root_dir)
    buckets = resolve_buckets(args.buckets, dataset, patient_bags=args.patient_bags)

    save_dir = Path("./eval_results") / f"EVAL_{args.save_exp_code}"
    models_dir = Path(args.results_dir) / str(args.models_exp_code)
    save_dir.mkdir(parents=True, exist_ok=True)
    splits_dir = Path(args.splits_dir) if args.splits_dir else models_dir
    if not models_dir.is_dir():
        raise FileNotFoundError(f"models dir not found: {models_dir}")

    echo_settings(
        save_dir / f"eval_experiment_{args.save_exp_code}.txt",
        {
            "task": args.task,
            "split": args.split,
            "save_dir": str(save_dir),
            "models_dir": str(models_dir),
            "drop_out": args.drop_out,
            "micro_avg": args.micro_average,
        },
    )

    model_cfg = ModelConfig(
        in_dim=args.encoding_size,
        n_classes=task.n_classes[0],
        dropout=args.drop_out,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.pallas,
    )

    folds = list(fold_range(args.k, args.k_start, args.k_end)) if args.fold == -1 else [args.fold]
    if not folds:
        raise SystemExit(
            f"empty fold window: k={args.k} k_start={args.k_start} k_end={args.k_end}"
        )
    if args.ensemble:
        if args.split != "all":
            raise SystemExit("--ensemble requires --split all (per-fold test splits are "
                             "disjoint, so their probabilities cannot be averaged per slide)")
        if len(folds) < 2:
            raise SystemExit("--ensemble needs at least two folds in the window")
    split_index = {"train": 0, "val": 1, "test": 2, "all": -1}[args.split]

    def run_fold(fold, _payload=None, device=None, log=print):
        """Everything one fold needs: eval pass + per-fold artifacts. Pure
        per-fold state (thread-safe), so --fold_devices can fan it out one
        fold per device; ``device=None`` is the sequential path unchanged."""
        if split_index < 0:
            split = dataset.subset(range(dataset.n_slides))
        else:
            splits = dataset.return_splits_from_csv(splits_dir / f"splits_{fold}.csv")
            split = splits[split_index]
            if split is None:
                raise ValueError(f"fold {fold}: requested split {args.split!r} is empty")

        if args.patient_bags:
            from toad_tpu.data.wsi_dataset import PatientBagSplit

            split = PatientBagSplit(split)
        res = evaluate_checkpoint(
            models_dir / checkpoint_name(fold),
            split,
            model_cfg,
            micro_average=args.micro_average,
            batch_size=args.batch_size,
            max_bag_size=args.max_bag_size,
            int8=args.int8,
            bucket_sizes=buckets,
            transfer_dtype=args.transfer_dtype,
            device=device,
        )
        for ci, auc in enumerate(res.cls_aucs):
            log(f"class {ci} auc: {auc}")
        log(f"fold {fold}: cls_auc {res.cls_auc:.4f} acc {res.cls_acc:.4f} site_auc {res.site_auc:.4f}")
        res.df.to_csv(save_dir / f"fold_{fold}.csv", index=False)

        # confusion matrix (true rows x predicted cols, canonical class names)
        # — the reference only prints per-class TPR (core_utils:242-259)
        import numpy as np

        from toad_tpu.utils import invert_labels

        n_cls = task.n_classes[0]
        names = [invert_labels(task.label_dicts[0]).get(c, str(c)) for c in range(n_cls)]
        cm = np.zeros((n_cls, n_cls), dtype=np.int64)
        np.add.at(cm, (res.df["Y"].astype(int), res.df["Y_hat"].astype(int)), 1)
        pd.DataFrame(cm, index=names, columns=names).to_csv(save_dir / f"fold_{fold}_confusion.csv")

        if args.calibrate:
            import json

            from toad_tpu.evaluate.calibration import calibration_report

            if args.split == "val":
                val_res = res  # the evaluated split IS the val split: no second pass
            else:
                split_csv = splits_dir / f"splits_{fold}.csv"
                if not split_csv.exists():
                    raise SystemExit(
                        f"--calibrate fits on fold {fold}'s val split but {split_csv} "
                        f"does not exist (pass --splits_dir, or evaluate --split val)"
                    )
                val_splits = dataset.return_splits_from_csv(split_csv)
                if val_splits[1] is None:
                    raise ValueError(f"fold {fold}: --calibrate needs a val split in {split_csv}")
                val_split = val_splits[1]
                if args.patient_bags:  # fit T at the same granularity as the eval
                    from toad_tpu.data.wsi_dataset import PatientBagSplit

                    val_split = PatientBagSplit(val_split)
                val_res = evaluate_checkpoint(
                    models_dir / checkpoint_name(fold), val_split, model_cfg,
                    batch_size=args.batch_size, max_bag_size=args.max_bag_size, int8=args.int8,
                    bucket_sizes=buckets, transfer_dtype=args.transfer_dtype,
                    device=device,
                )
            pcols = [f"p_{c}" for c in range(n_cls)]
            rep = calibration_report(
                val_res.df[pcols].to_numpy(), val_res.df["Y"].to_numpy(),
                res.df[pcols].to_numpy(), res.df["Y"].to_numpy(),
            )
            if args.split == "val":
                rep["note"] = "evaluated split IS the calibration split (self-calibrated)"
            elif args.split == "all":
                rep["note"] = ("evaluated split CONTAINS the calibration (val) slides "
                               "(partially self-calibrated)")
            (save_dir / f"fold_{fold}_calibration.json").write_text(json.dumps(rep, indent=2))
            log(f"fold {fold}: temperature {rep['temperature']:.3f}, "
                f"ece {rep['ece_before']:.4f} -> {rep['ece_after']:.4f}, "
                f"nll {rep['nll_before']:.4f} -> {rep['nll_after']:.4f}")

        ci_cols = {}
        if args.bootstrap > 0:
            import json

            from toad_tpu.evaluate.engine import bootstrap_result_cis

            cis = bootstrap_result_cis(
                res, task.n_classes[0],
                n_boot=args.bootstrap, micro_average=args.micro_average,
            )
            (save_dir / f"fold_{fold}_ci.json").write_text(json.dumps(cis, indent=2))
            for m, ci in cis.items():
                log(f"fold {fold}: {m} 95% CI [{ci['lo']:.4f}, {ci['hi']:.4f}] "
                    f"(mean {ci['mean']:.4f}, {ci['n_valid']}/{ci['n_boot']} valid draws)")
            ci_cols = {
                f"{m}_ci_lo": ci["lo"] for m, ci in cis.items()
            } | {f"{m}_ci_hi": ci["hi"] for m, ci in cis.items()}
        row = {
            "folds": fold,
            "cls_test_auc": res.cls_auc,
            "cls_test_acc": res.cls_acc,
            "cls_top3_acc": res.topk.get(3, float("nan")),
            "cls_top5_acc": res.topk.get(5, float("nan")),
            "site_test_auc": res.site_auc,
            "site_test_acc": res.site_acc,
            **ci_cols,
        }
        return row, res.df

    if args.fold_devices != 1:
        # one fold per local device (same work-queue engine as train
        # --fold_devices); per-fold outputs identical to the sequential run
        from toad_tpu.train.parallel_folds import map_folds_over_devices

        by_fold = map_folds_over_devices(
            [(fold, None) for fold in folds], run_fold, n_devices=args.fold_devices
        )
    else:
        by_fold = {fold: run_fold(fold) for fold in folds}

    rows = [by_fold[fold][0] for fold in folds]
    fold_dfs = [by_fold[fold][1] for fold in folds]

    if args.ensemble:
        import numpy as np

        from toad_tpu.evaluate.metrics import binary_auc, micro_ovr_auc, ovr_aucs, topk_accuracy

        n_cls = task.n_classes[0]
        pcols = [f"p_{c}" for c in range(n_cls)]
        base = fold_dfs[0]
        for d in fold_dfs[1:]:
            if list(d["slide_id"]) != list(base["slide_id"]):
                raise RuntimeError("fold outputs score different slides; cannot ensemble")
        probs = np.mean([d[pcols].to_numpy() for d in fold_dfs], axis=0)
        site_p = np.mean([d["site_p"].to_numpy() for d in fold_dfs], axis=0)
        labels = base["Y"].to_numpy().astype(int)
        sites = base["site"].to_numpy().astype(int)
        y_hat = probs.argmax(axis=1)
        site_hat = (site_p >= 0.5).astype(int)

        # same metric semantics as the per-fold engine (sentinels, top-k
        # ladder, macro=nanmean-of-OVR vs --micro_average)
        if len(np.unique(labels)) <= 1:
            cls_auc = -1.0
        elif n_cls == 2:
            cls_auc = binary_auc(labels, probs[:, 1])
        elif args.micro_average:
            cls_auc = micro_ovr_auc(labels, probs, n_cls)
        else:
            cls_auc = float(np.nanmean(ovr_aucs(labels, probs, n_cls)))
        site_auc = -1.0 if len(np.unique(sites)) <= 1 else binary_auc(sites, site_p)
        ks = (1, 3, 5) if n_cls > 5 else ((1, 3) if n_cls > 2 else (1,))
        topk = topk_accuracy(probs, labels, ks)

        edf = base[["slide_id", "sex", "Y"]].copy()
        edf["Y_hat"] = y_hat
        edf["site"] = base["site"].to_numpy()
        edf["site_hat"] = site_hat
        for c in range(n_cls):
            edf[f"p_{c}"] = probs[:, c]
        edf["site_p"] = site_p
        edf.to_csv(save_dir / "ensemble.csv", index=False)

        if args.calibrate:
            # one temperature for the whole ensemble (VERDICT r4 #5), fitted
            # with the DEPLOYMENT transform (per-member softmax at T, then
            # mean — serve/batcher._combine) on the union of the folds' val
            # slides; per-fold temperatures do not transfer to the mixture
            import json

            from toad_tpu.data.splits import load_split_csv
            from toad_tpu.evaluate.calibration import ensemble_calibration_report

            val_union: set = set()
            for fold in folds:
                split_csv = splits_dir / f"splits_{fold}.csv"
                if not split_csv.exists():
                    raise SystemExit(
                        f"--ensemble --calibrate fits on the folds' val slides but "
                        f"{split_csv} does not exist (pass --splits_dir)"
                    )
                val_union.update(load_split_csv(split_csv)["val"])
            member = np.stack([d[pcols].to_numpy() for d in fold_dfs])
            rep = ensemble_calibration_report(
                member, labels, base["slide_id"].isin(val_union).to_numpy()
            )
            rep["note"] = (
                "fit on the union of the folds' val slides (each was TRAINING data "
                "for the other folds: partially self-calibrated); eval-set ece/nll "
                "include the fit slides. Deploy with serve/infer --ensemble "
                "--temperature_from <this file>"
            )
            (save_dir / "ensemble_calibration.json").write_text(json.dumps(rep, indent=2))
            print(
                f"ensemble: temperature {rep['temperature']:.3f}, "
                f"ece {rep['ece_before']:.4f} -> {rep['ece_after']:.4f}, "
                f"nll {rep['nll_before']:.4f} -> {rep['nll_after']:.4f} "
                f"(fit on {rep['n_fit_slides']} val-union slides)"
            )
        rows.append(
            {
                "folds": "ensemble",
                "cls_test_auc": cls_auc,
                "cls_test_acc": float((y_hat == labels).mean()),
                "cls_top3_acc": topk.get(3, float("nan")),
                "cls_top5_acc": topk.get(5, float("nan")),
                "site_test_auc": site_auc,
                "site_test_acc": float((site_hat == sites).mean()),
            }
        )
        print(f"ensemble ({len(fold_dfs)} folds): cls_auc {cls_auc:.4f} "
              f"acc {rows[-1]['cls_test_acc']:.4f} site_auc {site_auc:.4f}")

    final_df = pd.DataFrame(rows)
    name = "summary.csv" if len(folds) == args.k else f"summary_partial_{folds[0]}_{folds[-1]}.csv"
    final_df.to_csv(save_dir / name)
    print(f"wrote {save_dir / name}")
    return final_df


if __name__ == "__main__":
    main()
