"""Fixture-scale accuracy parity: both sides trained on the reference's OWN
2,041-slide fixture (``/root/reference/dataset_csv/dummy_dataset.csv``, 18
classes) with its shipped fold-0 split
(``splits/dummy_mtl_concat_100/splits_0.csv``), 1024-d bags of 256-512
patches, canonical recipe (``--drop_out --early_stopping``, lr 2e-4 — the
README run, ``/root/reference/docs/README.md:88-114``).

This is BASELINE.json's acceptance criterion ("identical top-1/AUC on the
dummy split") at real scale — the round-4 verdict's top ask: every earlier
parity number came from dim-128 miniatures saturated at AUC 1.0. Bags are
graded-difficulty (``toad_tpu.data.synthetic.write_graded_bags``) so the
comparison has discriminating power.

The torch side is hours on the 1-core host — run it detached::

    python experiments/fixture_parity.py --prep            # write bags once
    setsid python experiments/fixture_parity.py --side ref --seeds 1 \
        --out experiments/results/fixture_parity.jsonl > /tmp/fixpar_ref.log 2>&1 &
    python experiments/fixture_parity.py --side ours --seeds 1,2,3 \
        --out experiments/results/fixture_parity.jsonl

Results append to --out as JSON lines (crash-resumable, recipe-keyed).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
sys.path.insert(0, str(Path(__file__).parent))  # experiments/

REF = Path("/root/reference")
REF_CSV = REF / "dataset_csv" / "dummy_dataset.csv"
REF_SPLIT = REF / "splits" / "dummy_mtl_concat_100" / "splits_0.csv"

DATA_ROOT = Path("/tmp/fixture_parity")
GEN = {  # bag-generation recipe; bump "v" to force regeneration
    "v": 1,
    "dim": 1024,
    "n_patches_range": (256, 512),
    "seed": 0,
    "strength_range": (0.25, 0.9),
    "signal_frac_range": (0.03, 0.09),
    "blank_frac": 0.08,
    "site_strength": 0.15,
}


def prep_bags() -> Path:
    """Write the shared 1024-d graded bags once (idempotent via marker)."""
    import pandas as pd

    from toad_tpu.data.synthetic import write_graded_bags
    from toad_tpu.registry import load_task

    bags = DATA_ROOT / "bags"
    marker = DATA_ROOT / "gen.json"
    want = json.dumps(GEN, sort_keys=True)
    if marker.exists() and marker.read_text() == want:
        return bags
    task = dataclasses.replace(load_task("dummy_mtl_concat"), csv_path=str(REF_CSV))
    manifest = pd.read_csv(REF_CSV)
    t0 = time.perf_counter()
    write_graded_bags(
        bags,
        manifest,
        task,
        n_patches_range=tuple(GEN["n_patches_range"]),
        dim=GEN["dim"],
        fmt="npy",
        seed=GEN["seed"],
        strength_range=tuple(GEN["strength_range"]),
        signal_frac_range=tuple(GEN["signal_frac_range"]),
        blank_frac=GEN["blank_frac"],
        site_strength=GEN["site_strength"],
    )
    marker.write_text(want)
    print(f"wrote {len(manifest)} bags in {time.perf_counter() - t0:.0f}s -> {bags}", flush=True)
    return bags


def load_fixture(bags: Path):
    """Dataset over the reference CSV + index spec from the shipped split."""
    from toad_tpu.data.splits import load_split_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.registry import load_task

    task = dataclasses.replace(load_task("dummy_mtl_concat"), csv_path=str(REF_CSV))
    ds = WSIBagDataset(task, data_dir=str(bags), print_info=False)
    sid_to_idx = {s: i for i, s in enumerate(ds.slide_ids)}
    members = load_split_csv(REF_SPLIT)
    spec = SimpleNamespace(
        **{k: np.asarray([sid_to_idx[s] for s in v], np.int64) for k, v in members.items()}
    )
    assert (len(spec.train), len(spec.val), len(spec.test)) == (1532, 168, 342)
    return ds, spec


def train_ours_fixture(ds, spec, epochs: int, lr: float, seed: int, batch_size: int = 8):
    from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
    from toad_tpu.train.loop import FoldTrainer

    cfg = TrainConfig(
        max_epochs=epochs,
        seed=seed,
        resume=True,
        early_stopping=True,
        # the axon relay client leaks every transferred byte host-side
        # (~2.8 GB/epoch at this scale — the r5 seed-1 first attempt was
        # OOM-killed at 130 GB); snapshot + re-exec well before that
        rss_restart_gb=48.0,
        model=ModelConfig(in_dim=GEN["dim"], n_classes=18, dropout=True),
        optim=OptimConfig(lr=lr),
        # batch 8 is OUR canonical recipe; --batch_size 1 reproduces the
        # reference's bag-at-a-time optimizer granularity as a diagnostic
        data=DataConfig(batch_size=batch_size, bucket_sizes=(320, 448, 512)),
    )
    trainer = FoldTrainer(
        cfg, fold=0,
        results_dir=DATA_ROOT / (
            f"results_ours_e{epochs}_s{seed}"
            + (f"_b{batch_size}" if batch_size != 8 else "")
        ),
    )
    r = trainer.train(
        ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test),
        log_fn=lambda s: print(s, flush=True),
    )
    test = r["test"]
    return np.asarray(test["y_prob"]), np.asarray(test["label"]), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep", action="store_true", help="only generate the shared bags, then exit")
    ap.add_argument("--side", choices=["ref", "ours"], default=None)
    ap.add_argument("--seeds", type=str, default="1")
    ap.add_argument("--epochs", type=int, default=200, help="max epochs (early stopping: patience 20 / min-epoch 50)")
    ap.add_argument("--lr", type=float, default=2e-4, help="the README paper recipe (docs/README.md:90)")
    ap.add_argument("--batch_size", type=int, default=8,
                    help="ours-side optimizer batch; 1 = reference bag-at-a-time granularity")
    ap.add_argument("--out", type=str, default="experiments/results/fixture_parity.jsonl")
    args = ap.parse_args()

    bags = prep_bags()
    if args.prep:
        return

    from accuracy_parity import train_reference

    from toad_tpu.evaluate.metrics import macro_ovr_auc, topk_accuracy

    ds, spec = load_fixture(bags)
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            r = json.loads(line)
            if "side" in r and r.get("fixture") == GEN["v"] and r.get("epochs") == args.epochs:
                # ref has no batch knob; ours records key on theirs (default 8)
                done.add((r["side"], r["seed"], 8 if r["side"] == "ref" else r.get("batch_size", 8)))

    seeds = [int(s) for s in args.seeds.split(",")]
    sides = [args.side] if args.side else ["ours", "ref"]
    for seed in seeds:
        for side in sides:
            key_bs = args.batch_size if side == "ours" else 8
            if (side, seed, key_bs) in done:
                print(f"skip {side} seed {seed} (already in {out_path})", flush=True)
                continue
            t0 = time.perf_counter()
            if side == "ours":
                try:
                    probs, labels, _ = train_ours_fixture(
                        ds, spec, args.epochs, args.lr, seed, args.batch_size
                    )
                except Exception as e:
                    from toad_tpu.train.loop import HostRssWatermark

                    if not isinstance(e, HostRssWatermark):
                        raise
                    # leaked transfer-client memory cannot be reclaimed
                    # in-process: re-exec with identical argv — finished
                    # (side, seed) rows skip via the done-set, the current
                    # seed resumes from its snapshot
                    import os

                    print(f"RSS watermark ({e}); re-exec to resume", flush=True)
                    os.execv(sys.executable, [sys.executable] + sys.argv)
            else:
                probs, labels = train_reference(
                    ds, spec, GEN["dim"], args.epochs, args.lr, seed=seed,
                    dropout=True, early_stopping=True,
                    epoch_log=lambda rec: print(json.dumps({"side": "ref", "seed": seed, **rec}), flush=True),
                )
            rec = {
                "side": side,
                "seed": seed,
                **({"batch_size": args.batch_size} if side == "ours" and args.batch_size != 8 else {}),
                "fixture": GEN["v"],
                "epochs": args.epochs,
                "lr": args.lr,
                "slides": int(ds.n_slides),
                "auc": round(macro_ovr_auc(labels, probs, 18), 4),
                "top1": round(topk_accuracy(probs, labels, (1,))[1], 4),
                "top3": round(topk_accuracy(probs, labels, (1, 3))[3], 4),
                "train_s": round(time.perf_counter() - t0, 1),
            }
            print(json.dumps(rec), flush=True)
            with out_path.open("a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
