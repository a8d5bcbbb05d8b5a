"""``python -m toad_tpu.cli.train`` — k-fold training driver.

Flag parity with the reference ``main_mtl_concat.py:81-106`` plus TPU-native
knobs (--batch_size, --bf16, --pallas, --data_shards/--bag_shards). Produces
the reference's results layout: ``results/{exp_code}_s{seed}/`` with
``experiment_{exp_code}.txt``, per-fold ``splits_{i}.csv``,
``s_{i}_checkpoint``, ``split_{i}_results.pkl``, and ``summary.csv``
(``main_mtl_concat.py:64-78,163-180``).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import pandas as pd

from toad_tpu.cli.common import add_task_arg, build_dataset, echo_settings, require_data_root
from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig, fold_range
from toad_tpu.train.loop import FoldTrainer, HostRssWatermark
from toad_tpu.utils.io import save_pkl
from toad_tpu.utils.logging import make_writer
from toad_tpu.utils.rng import seed_everything


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Configurations for WSI training (TPU-native)")
    add_task_arg(p)
    p.add_argument("--data_root_dir", type=str, default=None, help="directory containing feature bags")
    p.add_argument("--max_epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reg", type=float, default=1e-5, help="weight decay")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--k_start", type=int, default=-1)
    p.add_argument("--k_end", type=int, default=-1)
    p.add_argument("--results_dir", default="./results")
    p.add_argument("--split_dir", type=str, default=None)
    p.add_argument("--log_data", action="store_true", default=False)
    p.add_argument("--testing", action="store_true", default=False, help="1%% subsample dry run")
    p.add_argument("--early_stopping", action="store_true", default=False)
    p.add_argument("--opt", type=str, choices=["adam", "sgd"], default="adam")
    p.add_argument("--drop_out", action="store_true", default=False)
    p.add_argument("--exp_code", type=str, required=True)
    p.add_argument("--weighted_sample", action="store_true", default=False)
    # TPU-native knobs
    p.add_argument("--encoding_size", type=int, default=1024, help="patch feature dimension")
    p.add_argument("--batch_size", type=int, default=8, help="bags per step (1 = reference semantics)")
    p.add_argument("--max_bag_size", type=int, default=None)
    p.add_argument("--buckets", type=str, default=None, metavar="LIST|auto",
                   help="bucket ladder: comma-separated sizes, or 'auto' to derive "
                        "quantile rungs from the dataset's real patch counts "
                        "(metadata reads only; cuts padding overhead vs the default "
                        "pow2 ladder — `toad_tpu validate` reports both)")
    p.add_argument("--bf16", action="store_true", default=False, help="bfloat16 compute")
    p.add_argument("--pallas", action="store_true", default=False, help="fused Pallas pooling kernel")
    p.add_argument("--data_shards", type=int, default=1)
    p.add_argument("--bag_shards", type=int, default=1)
    p.add_argument("--fold_devices", type=int, default=1, metavar="N",
                   help="train folds concurrently, one per local device (N devices; -1 = all). "
                        "Bit-identical per fold to the sequential run; incompatible with "
                        "--data_shards/--bag_shards/--profile")
    p.add_argument("--resume", action="store_true", default=False, help="preemption-tolerant per-epoch state snapshots + resume")
    p.add_argument("--rss_restart_gb", type=float, default=None, metavar="GB",
                   help="leaky-runtime containment (requires --resume): when host RSS crosses "
                        "GB at an epoch boundary, snapshot and re-exec this process, resuming "
                        "where it left off (this platform's TPU relay client permanently leaks "
                        "every transferred byte host-side; long trainings OOM without this)")
    p.add_argument("--patient_bags", action="store_true", default=False, help="concat each patient's slides into one bag")
    p.add_argument("--bf16_transfer", action="store_true", default=False, help="force bfloat16 feature transfer even under f32 compute (half the H2D bytes; on automatically with --bf16)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR", help="write a jax.profiler trace of the first train steps to DIR")
    p.add_argument("--native_io", type=str, choices=["auto", "on", "off"], default="auto", help="C++ zero-copy bag loader")
    p.add_argument("--debug_checks", action="store_true", default=False, help="checkified train step: raise on NaN/Inf/bad labels (slow)")
    p.add_argument("--debug_nans", action="store_true", default=False, help="global jax_debug_nans NaN trapping (very slow)")
    p.add_argument("--compile_cache", type=str, default=None, metavar="DIR", help="persistent XLA compilation cache (restarts/resumes skip recompiles)")
    return p


def resolve_buckets(args, dataset) -> tuple[int, ...] | None:
    from toad_tpu.cli.common import resolve_buckets as _resolve

    return _resolve(args.buckets, dataset, bag_shards=args.bag_shards,
                    patient_bags=args.patient_bags)


def config_from_args(args, n_classes: int, bucket_sizes: tuple[int, ...] | None = None) -> TrainConfig:
    return TrainConfig(
        exp_code=args.exp_code,
        task=args.task,
        results_dir=args.results_dir,
        split_dir=args.split_dir,
        max_epochs=args.max_epochs,
        seed=args.seed,
        k=args.k,
        k_start=args.k_start,
        k_end=args.k_end,
        early_stopping=args.early_stopping,
        resume=args.resume,
        rss_restart_gb=args.rss_restart_gb,
        profile_dir=args.profile,
        debug_checks=args.debug_checks,
        log_data=args.log_data,
        testing=args.testing,
        model=ModelConfig(
            in_dim=args.encoding_size,
            n_classes=n_classes,
            dropout=args.drop_out,
            compute_dtype="bfloat16" if args.bf16 else "float32",
            use_pallas=args.pallas,
        ),
        optim=OptimConfig(name=args.opt, lr=args.lr, weight_decay=args.reg),
        data=DataConfig(
            data_dir=args.data_root_dir,
            batch_size=args.batch_size,
            **({"bucket_sizes": bucket_sizes} if bucket_sizes else {}),
            max_bag_size=args.max_bag_size,
            weighted_sample=args.weighted_sample,
            testing_frac=0.01 if args.testing else None,
            native=args.native_io,
            patient_bags=args.patient_bags,
            # default 'auto': bf16 wire iff --bf16 compute (numerically
            # invisible there, half the relay bytes); the flag forces it on
            transfer_dtype="bfloat16" if args.bf16_transfer else "auto",
        ),
        data_shards=args.data_shards,
        bag_shards=args.bag_shards,
    )


def _reexec(argv: list[str]) -> None:
    """Replace this process with a fresh `python -m toad_tpu.cli.train <argv>`.
    Factored out so tests can intercept it."""
    import os
    import sys

    os.execv(sys.executable, [sys.executable, "-m", "toad_tpu.cli.train", *argv])


def main(argv=None):
    args = make_parser().parse_args(argv)
    if args.rss_restart_gb is not None and not args.resume:
        raise SystemExit("--rss_restart_gb requires --resume (restart would lose all progress)")
    if args.fold_devices != 1:
        # fail before any dataset/backend work: fold-parallel owns the
        # devices whole, one fold per chip (train/parallel_folds.py)
        if args.data_shards > 1 or args.bag_shards > 1:
            raise ValueError("--fold_devices cannot combine with --data_shards/--bag_shards")
        if args.profile:
            raise ValueError("--profile supports one trace at a time; drop --fold_devices")
    if args.compile_cache:
        from toad_tpu.cli.common import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    if args.debug_nans:
        from toad_tpu.utils.debug import enable_debug_nans

        enable_debug_nans()
    seed_everything(args.seed)
    require_data_root(args)
    task, dataset = build_dataset(args, data_dir=args.data_root_dir)
    cfg = config_from_args(args, n_classes=task.n_classes[0], bucket_sizes=resolve_buckets(args, dataset))

    results_dir = Path(args.results_dir) / f"{args.exp_code}_s{args.seed}"
    results_dir.mkdir(parents=True, exist_ok=True)

    split_dir = Path(args.split_dir) if args.split_dir else Path("splits") / f"{task.name}_100"
    if not split_dir.is_dir():
        raise FileNotFoundError(f"split dir not found: {split_dir} (run toad_tpu.cli.create_splits first)")

    settings = cfg.settings_dict()
    settings["split_dir"] = str(split_dir)
    echo_settings(results_dir / f"experiment_{args.exp_code}.txt", settings)

    folds = fold_range(args.k, args.k_start, args.k_end)

    def load_fold_splits(i: int):
        splits = dataset.return_splits_from_csv(split_dir / f"splits_{i}.csv")
        if any(s is None for s in splits):
            raise ValueError(f"fold {i}: empty split in {split_dir / f'splits_{i}.csv'}")
        return splits

    def summary_row(i: int, r: dict) -> dict:
        return {
            "folds": i,
            "cls_test_auc": r["cls_test_auc"],
            "cls_val_auc": r["cls_val_auc"],
            "cls_test_acc": r["cls_test_acc"],
            "cls_val_acc": r["cls_val_acc"],
            "site_test_auc": r["site_test_auc"],
            "site_val_auc": r["site_val_auc"],
            "site_test_acc": r["site_test_acc"],
            "site_val_acc": r["site_val_acc"],
        }

    def finish_fold(i: int, r: dict) -> dict:
        save_pkl(results_dir / f"split_{i}_results.pkl", r["results"])
        row = summary_row(i, r)
        if args.resume:
            import json as _json

            (results_dir / f"fold_{i}_summary.json").write_text(_json.dumps(row))
        return row

    rows_by_fold: dict[int, dict] = {}
    pending: list[int] = []
    for i in folds:
        fold_summary = results_dir / f"fold_{i}_summary.json"
        if args.resume and fold_summary.exists():
            # fold finished in a previous (preempted) run — don't retrain it
            import json as _json

            rows_by_fold[i] = _json.loads(fold_summary.read_text())
            print(f"fold {i}: already complete ({fold_summary}), skipping")
        else:
            pending.append(i)

    try:
        if args.fold_devices != 1 and pending:
            # one fold per local device, concurrently (train/parallel_folds.py);
            # per-fold results are bit-identical to the sequential path
            from toad_tpu.train.parallel_folds import train_folds_parallel

            # persist each fold's artifacts the moment it finishes (not after the
            # whole fan-out): a preemption then loses only in-flight folds, and
            # --resume restarts skip the completed ones
            train_folds_parallel(
                cfg,
                [(i, load_fold_splits(i)) for i in pending],
                results_dir,
                n_devices=args.fold_devices,
                make_fold_writer=lambda i: make_writer(str(results_dir / str(i)), enabled=args.log_data),
                on_result=lambda i, r: rows_by_fold.__setitem__(i, finish_fold(i, r)),
            )
        else:
            for i in pending:
                seed_everything(args.seed)
                splits = load_fold_splits(i)
                writer = make_writer(str(results_dir / str(i)), enabled=args.log_data)
                trainer = FoldTrainer(cfg, fold=i, results_dir=results_dir, writer=writer)
                r = trainer.train(*splits)
                writer.close()
                rows_by_fold[i] = finish_fold(i, r)
    except (HostRssWatermark, RuntimeError) as e:
        # fold-parallel wraps worker errors in RuntimeError (cause chains)
        wm = e if isinstance(e, HostRssWatermark) else e.__cause__
        if not isinstance(wm, HostRssWatermark):
            raise
        # leaked transfer-client memory is not reclaimable in-process: replace
        # the process; completed folds skip via fold_<i>_summary.json, the
        # interrupted fold resumes from the snapshot the watermark just saved
        print(f"{wm} — re-exec to reclaim leaked transfer-client memory", flush=True)
        _reexec(list(argv) if argv is not None else __import__("sys").argv[1:])
        return  # unreachable after execv; present for monkeypatched tests

    rows = [rows_by_fold[i] for i in folds]

    final_df = pd.DataFrame(rows)
    name = "summary.csv" if len(folds) == args.k else f"summary_partial_{folds.start}_{folds.stop}.csv"
    final_df.to_csv(results_dir / name)
    print(f"finished! wrote {results_dir / name}")
    return final_df


if __name__ == "__main__":
    main()
