"""Accuracy parity: the reference model (imported from /root/reference,
trained with its own bag-at-a-time torch semantics) vs this framework, on
the same synthetic dataset and split — BASELINE.json's "identical top-1/AUC"
acceptance criterion, measured.

Run: python experiments/accuracy_parity.py [--dim 128 --epochs 6]
Prints one JSON line with both AUC/top-1 numbers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root

REF = Path("/root/reference")


def build_data(dim: int, seed: int = 0, tmp: Path = Path("/tmp/acc_parity"), n_patients: int = 80):
    from toad_tpu.data.splits import generate_splits
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    tmp.mkdir(parents=True, exist_ok=True)
    csv = tmp / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=n_patients, max_slides_per_patient=2, seed=seed)
    task = dummy_task(str(csv))
    write_dummy_bags(tmp / "bags", manifest, task, n_patches_range=(32, 160), dim=dim, fmt="npy", seed=seed)
    ds = WSIBagDataset(task, data_dir=str(tmp / "bags"), print_info=False)
    counts = np.bincount(ds.labels, minlength=ds.num_classes[0])
    spec = next(
        generate_splits(
            ds.slide_cls_ids,
            val_num=np.maximum((counts * 0.15).astype(int), 1),
            test_num=np.maximum((counts * 0.2).astype(int), 1),
            samples=ds.n_slides,
            n_splits=1,
            seed=1,
        )
    )
    return ds, spec


def train_reference(ds, spec, dim: int, epochs: int, lr: float, seed: int = 1,
                    dropout: bool = False, early_stopping: bool = False,
                    epoch_log=None):
    """The reference's exact training semantics: its model class, Adam with
    L2 weight decay, one bag per optimizer step, 0.75/0.25 MTL loss
    (core_utils_mtl_concat.py:190-259), shuffled per epoch. With
    ``early_stopping``, its EarlyStopping semantics too: patience 20 /
    min-epoch 50, monitoring mean val CLS loss only (``:44-85,360``), best
    state restored before test."""
    import copy

    import torch
    import torch.nn.functional as F

    if "torchvision" not in sys.modules:  # reference's unused import
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    sys.path.insert(0, str(REF))
    try:
        from models.model_toad import TOAD_fc_mtl_concat
    finally:
        sys.path.remove(str(REF))

    torch.manual_seed(seed)
    np.random.seed(seed)
    model = TOAD_fc_mtl_concat(gate=True, size_arg="big", dropout=dropout, n_classes=18)
    # the reference hard-codes 1024-d input; patch its first Linear for dim
    import torch.nn as nn

    if dim != 1024:
        model.attention_net[0] = nn.Linear(dim, 512)
        nn.init.xavier_normal_(model.attention_net[0].weight)
        model.attention_net[0].bias.data.zero_()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)

    def val_cls_loss(want_auc: bool = False):
        model.eval()
        tot = 0.0
        probs, labs = [], []
        with torch.no_grad():
            for i in np.asarray(spec.val):
                feats = torch.from_numpy(np.asarray(ds.load_bag(int(i)), np.float32))
                out = model(feats, torch.tensor([float(ds.sexes[i])]))
                tot += float(F.cross_entropy(out["logits"], torch.tensor([int(ds.labels[i])])))
                if want_auc:
                    probs.append(out["Y_prob"].numpy()[0])
                    labs.append(int(ds.labels[i]))
        model.train()
        mean_loss = tot / max(len(spec.val), 1)
        if not want_auc:
            return mean_loss
        from toad_tpu.evaluate.metrics import macro_ovr_auc

        n_cls = model.classifier.out_features
        return mean_loss, macro_ovr_auc(np.asarray(labs), np.asarray(probs), n_cls)

    train_ids = np.asarray(spec.train)
    rng = np.random.RandomState(seed)
    model.train()
    best_state, best_loss, patience_ct = None, None, 0
    for epoch in range(epochs):
        for i in rng.permutation(train_ids):
            feats = torch.from_numpy(np.asarray(ds.load_bag(int(i)), np.float32))
            label = torch.tensor([int(ds.labels[i])])
            site = torch.tensor([int(ds.sites[i])])
            sex = torch.tensor([float(ds.sexes[i])])  # reference expects a tensor (sex.repeat, model_toad.py:99)
            out = model(feats, sex)
            loss = 0.75 * F.cross_entropy(out["logits"], label) + 0.25 * F.cross_entropy(out["site_logits"], site)
            loss.backward()
            opt.step()
            opt.zero_grad()
        if early_stopping:
            if epoch_log is not None:
                vl, vauc = val_cls_loss(want_auc=True)
                epoch_log({"epoch": epoch, "val_cls_loss": round(vl, 4), "val_auc": round(float(vauc), 4)})
            else:
                vl = val_cls_loss()
            # reference EarlyStopping (core_utils:63-77): tie-or-better counts
            # as improvement (resets counter, saves); stop needs epoch > 50
            if best_loss is None or vl <= best_loss:
                best_loss, patience_ct = vl, 0
                best_state = copy.deepcopy(model.state_dict())
            else:
                patience_ct += 1
                if patience_ct >= 20 and epoch > 50:
                    break
    if early_stopping and best_state is not None:
        model.load_state_dict(best_state)

    model.eval()
    probs, labels = [], []
    with torch.no_grad():
        for i in np.asarray(spec.test):
            feats = torch.from_numpy(np.asarray(ds.load_bag(int(i)), np.float32))
            out = model(feats, torch.tensor([float(ds.sexes[i])]))
            probs.append(out["Y_prob"].numpy()[0])
            labels.append(int(ds.labels[i]))
    return np.asarray(probs), np.asarray(labels)


def train_ours(ds, spec, dim: int, epochs: int, lr: float, batch_size: int = 8, tmp: Path = Path("/tmp/acc_parity"), seed: int = 1,
               dropout: bool = False, early_stopping: bool = False):
    from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
    from toad_tpu.train.loop import FoldTrainer

    # the resume-snapshot dir must be recipe-keyed, or a rerun with different
    # flags would silently resume mid-training state from the other recipe
    recipe = f"d{dim}_e{epochs}_lr{lr:g}_do{int(dropout)}_es{int(early_stopping)}"
    cfg = TrainConfig(
        max_epochs=epochs,
        seed=seed,
        resume=True,  # long early-stopping sweeps must survive kills at epoch granularity
        early_stopping=early_stopping,
        model=ModelConfig(in_dim=dim, n_classes=18, dropout=dropout),
        optim=OptimConfig(lr=lr),
        data=DataConfig(batch_size=batch_size, bucket_sizes=(64, 128, 256)),
    )
    trainer = FoldTrainer(cfg, fold=0, results_dir=tmp / f"results_{recipe}_s{seed}")
    r = trainer.train(
        ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test), log_fn=lambda s: None
    )
    test = r["test"]
    return np.asarray(test["y_prob"]), np.asarray(test["label"]), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch_size", type=int, default=8, help="1 = the reference's exact one-bag-one-step semantics")
    ap.add_argument("--n_patients", type=int, default=80, help="~1.5 slides/patient; 1200 -> ~1800-slide dataset")
    ap.add_argument("--seeds", type=str, default="1", help="comma-separated training seeds, run per side")
    ap.add_argument("--out", type=str, default=None, help="append per-seed JSON lines here (crash-resumable)")
    ap.add_argument("--dropout", action="store_true", help="reference README recipe: --drop_out (p=.25 at the reference positions)")
    ap.add_argument("--early_stopping", action="store_true",
                    help="reference README recipe: patience 20 / min-epoch 50 on val cls loss, best state restored (set --epochs > 50)")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    from toad_tpu.evaluate.metrics import macro_ovr_auc, topk_accuracy

    ds, spec = build_data(args.dim, n_patients=args.n_patients)
    print(
        json.dumps({"dataset": {"slides": int(ds.n_slides), "train": len(spec.train), "val": len(spec.val), "test": len(spec.test)}}),
        flush=True,
    )
    out_path = Path(args.out) if args.out else None
    done: dict[tuple[str, int], dict] = {}
    if out_path and out_path.exists():  # resume a crashed sweep
        for line in out_path.read_text().splitlines():
            r = json.loads(line)
            # only reuse records from the SAME recipe — a shared --out file
            # must not satisfy a different flag combination's seeds
            if "side" in r and all(
                r.get(k) == v
                for k, v in (("dim", args.dim), ("epochs", args.epochs),
                             ("dropout", args.dropout), ("early_stopping", args.early_stopping))
            ):
                done[(r["side"], r["seed"])] = r

    def record(side: str, seed: int, probs, labels, secs: float) -> dict:
        r = {
            "side": side,
            "seed": seed,
            "dim": args.dim,
            "epochs": args.epochs,
            "dropout": args.dropout,
            "early_stopping": args.early_stopping,
            "auc": round(macro_ovr_auc(labels, probs, 18), 4),
            "top1": round(topk_accuracy(probs, labels, (1,))[1], 4),
            "top3": round(topk_accuracy(probs, labels, (1, 3))[3], 4),
            "train_s": round(secs, 1),
        }
        print(json.dumps(r), flush=True)
        if out_path:
            with out_path.open("a") as f:
                f.write(json.dumps(r) + "\n")
        return r

    results = []
    for seed in seeds:
        for side in ("ours", "ref"):
            if (side, seed) in done:
                results.append(done[(side, seed)])
                continue
            t0 = time.perf_counter()
            if side == "ours":
                probs, labels, _ = train_ours(
                    ds, spec, args.dim, args.epochs, args.lr, args.batch_size, seed=seed,
                    dropout=args.dropout, early_stopping=args.early_stopping,
                )
            else:
                probs, labels = train_reference(
                    ds, spec, args.dim, args.epochs, args.lr, seed=seed,
                    dropout=args.dropout, early_stopping=args.early_stopping,
                )
            results.append(record(side, seed, probs, labels, time.perf_counter() - t0))

    if len(seeds) > 1:
        agg = {"dim": args.dim, "epochs": args.epochs, "n_seeds": len(seeds), "slides": int(ds.n_slides)}
        for side in ("ours", "ref"):
            rows = [r for r in results if r["side"] == side]
            for m in ("auc", "top1", "top3"):
                vals = np.asarray([r[m] for r in rows])
                agg[f"{side}_{m}_mean"] = round(float(vals.mean()), 4)
                agg[f"{side}_{m}_std"] = round(float(vals.std(ddof=1)), 4)
        # overlap check: |mean gap| within the combined 2-sigma interval
        for m in ("auc", "top1"):
            gap = abs(agg[f"ours_{m}_mean"] - agg[f"ref_{m}_mean"])
            spread = 2 * (agg[f"ours_{m}_std"] ** 2 / len(seeds) + agg[f"ref_{m}_std"] ** 2 / len(seeds)) ** 0.5
            agg[f"{m}_gap"] = round(gap, 4)
            agg[f"{m}_overlap"] = bool(gap <= max(spread, 1e-9))
        print(json.dumps(agg), flush=True)
        if out_path:
            with out_path.open("a") as f:
                f.write(json.dumps(agg) + "\n")


if __name__ == "__main__":
    main()
