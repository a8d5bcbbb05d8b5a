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


def build_data(dim: int, seed: int = 0, tmp: Path = Path("/tmp/acc_parity")):
    from toad_tpu.data.splits import generate_splits
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    tmp.mkdir(parents=True, exist_ok=True)
    csv = tmp / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=80, max_slides_per_patient=2, seed=seed)
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


def train_reference(ds, spec, dim: int, epochs: int, lr: float, seed: int = 1):
    """The reference's exact training semantics: its model class, Adam with
    L2 weight decay, one bag per optimizer step, 0.75/0.25 MTL loss
    (core_utils_mtl_concat.py:190-259), shuffled per epoch."""
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
    model = TOAD_fc_mtl_concat(gate=True, size_arg="big", dropout=False, n_classes=18)
    # the reference hard-codes 1024-d input; patch its first Linear for dim
    import torch.nn as nn

    if dim != 1024:
        model.attention_net[0] = nn.Linear(dim, 512)
        nn.init.xavier_normal_(model.attention_net[0].weight)
        model.attention_net[0].bias.data.zero_()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)

    train_ids = np.asarray(spec.train)
    rng = np.random.RandomState(seed)
    model.train()
    for _ in range(epochs):
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

    model.eval()
    probs, labels = [], []
    with torch.no_grad():
        for i in np.asarray(spec.test):
            feats = torch.from_numpy(np.asarray(ds.load_bag(int(i)), np.float32))
            out = model(feats, torch.tensor([float(ds.sexes[i])]))
            probs.append(out["Y_prob"].numpy()[0])
            labels.append(int(ds.labels[i]))
    return np.asarray(probs), np.asarray(labels)


def train_ours(ds, spec, dim: int, epochs: int, lr: float, batch_size: int = 8, tmp: Path = Path("/tmp/acc_parity")):
    from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
    from toad_tpu.train.loop import FoldTrainer

    cfg = TrainConfig(
        max_epochs=epochs,
        seed=1,
        model=ModelConfig(in_dim=dim, n_classes=18),
        optim=OptimConfig(lr=lr),
        data=DataConfig(batch_size=batch_size, bucket_sizes=(64, 128, 256)),
    )
    trainer = FoldTrainer(cfg, fold=0, results_dir=tmp / "results")
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
    args = ap.parse_args()

    from toad_tpu.evaluate.metrics import macro_ovr_auc, topk_accuracy

    ds, spec = build_data(args.dim)

    t0 = time.perf_counter()
    ours_probs, ours_labels, _ = train_ours(ds, spec, args.dim, args.epochs, args.lr, args.batch_size)
    t_ours = time.perf_counter() - t0

    t0 = time.perf_counter()
    ref_probs, ref_labels = train_reference(ds, spec, args.dim, args.epochs, args.lr)
    t_ref = time.perf_counter() - t0

    # bucketed eval reorders rows; same test membership is what matters
    np.testing.assert_array_equal(np.sort(ours_labels), np.sort(ref_labels))
    result = {
        "dim": args.dim,
        "batch_size": args.batch_size,
        "epochs": args.epochs,
        "ours_auc": round(macro_ovr_auc(ours_labels, ours_probs, 18), 4),
        "ref_auc": round(macro_ovr_auc(ref_labels, ref_probs, 18), 4),
        "ours_top1": round(topk_accuracy(ours_probs, ours_labels, (1,))[1], 4),
        "ref_top1": round(topk_accuracy(ref_probs, ref_labels, (1,))[1], 4),
        "ours_train_s": round(t_ours, 1),
        "ref_train_s": round(t_ref, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
