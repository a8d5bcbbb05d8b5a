"""Interop proof in the ours->reference direction: the REFERENCE's own eval
code (`/root/reference/utils/eval_utils_mtl_concat.py`, run verbatim with
torch) evaluates a checkpoint TRAINED AND EXPORTED BY THIS FRAMEWORK on bags
WRITTEN BY THIS FRAMEWORK's native torch-zip writer, and must report the same
AUC/top-k as our own eval engine.

This closes the loop the other parity tests leave open: torch->ours loading
is covered by tests/test_torch_interop.py; here the reference consumes our
artifacts (`export_torch_checkpoint` state_dict + `save_torch_pickle` .pt
bags) with zero modifications.

Run: python experiments/reference_eval_interop.py [--dim 1024 --epochs 3]
Prints one JSON line with both sides' metrics.
"""

from __future__ import annotations

import argparse
import importlib.machinery
import json
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REF = Path("/root/reference")
TMP = Path("/tmp/ref_eval_interop")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from toad_tpu.config import DataConfig, ModelConfig, TrainConfig
    from toad_tpu.data.splits import generate_splits
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.torch_io import save_torch_pickle
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.evaluate.engine import evaluate_split
    from toad_tpu.models.toad_mil import ToadMIL
    from toad_tpu.models.torch_interop import export_torch_checkpoint
    from toad_tpu.train.loop import FoldTrainer

    TMP.mkdir(parents=True, exist_ok=True)
    csv_path = TMP / "m.csv"
    manifest = write_dummy_csv(csv_path, n_patients=40, max_slides_per_patient=2, seed=0)
    task = dummy_task(str(csv_path))
    write_dummy_bags(TMP / "bags", manifest, task, n_patches_range=(32, 120), dim=args.dim, fmt="npy", seed=0)

    ds = WSIBagDataset(task, data_dir=str(TMP / "bags"), print_info=False)
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

    # 1. train here (short), export the checkpoint in the reference's format
    cfg = TrainConfig(
        max_epochs=args.epochs,
        model=ModelConfig(in_dim=args.dim, n_classes=18),
        data=DataConfig(batch_size=8, bucket_sizes=(64, 128)),
    )
    trainer = FoldTrainer(cfg, fold=0, results_dir=TMP / "results")
    r = trainer.train(ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test), log_fn=lambda s: None)
    import jax

    params = jax.tree.map(np.asarray, r["params"])
    ckpt_pt = TMP / "s_0_checkpoint.pt"
    export_torch_checkpoint(ckpt_pt, params, dropout=False)

    # 2. write every test bag as a torch-zip .pt via OUR writer
    pt_dir = TMP / "pt_bags"
    pt_dir.mkdir(exist_ok=True)
    test_split = ds.subset(spec.test)
    for i in range(len(test_split)):
        feats = np.asarray(test_split.load_bag(i), np.float32)
        save_torch_pickle(pt_dir / f"{test_split.slide_ids[i]}.pt", np.ascontiguousarray(feats))

    # 3. the REFERENCE evaluates our artifacts, verbatim
    import torch  # noqa: F401 — BEFORE the torchvision stub: torch probes
    # find_spec("torchvision") at import, which chokes on a spec-less stub

    if "torchvision" not in sys.modules:  # reference's unused import
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "torchsummary" not in sys.modules:  # another unused reference import
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts
    sys.path.insert(0, str(REF))
    try:
        # the reference's `datasets/` has no __init__.py (namespace pkg) and
        # loses to the installed HuggingFace `datasets`; load it by file path
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_dataset_mtl_concat", REF / "datasets" / "dataset_mtl_concat.py"
        )
        ref_ds_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_ds_mod)
        Generic_MIL_MTL_Dataset = ref_ds_mod.Generic_MIL_MTL_Dataset
        # reference modules also do `from datasets.dataset_mtl_concat import
        # ...` internally — alias our file-loaded module there so they don't
        # hit HuggingFace datasets either
        pkg = types.ModuleType("datasets")
        pkg.__path__ = []  # behaves like a package
        pkg.__spec__ = importlib.machinery.ModuleSpec("datasets", None, is_package=True)
        pkg.dataset_mtl_concat = ref_ds_mod
        sys.modules["datasets"] = pkg
        sys.modules["datasets.dataset_mtl_concat"] = ref_ds_mod
        from utils import eval_utils_mtl_concat as ref_eval
    finally:
        sys.path.remove(str(REF))

    # restrict the CSV to the test split so the reference's whole-dataset
    # eval covers exactly our test set
    import pandas as pd

    # pandas 3 infers arrow-backed str columns, which reject the reference's
    # df_prep writing ints into the 'label' column; restore the object-dtype
    # behavior the reference was written against
    pd.set_option("future.infer_string", False)

    df = pd.read_csv(csv_path)
    test_ids = set(str(s) for s in test_split.slide_ids)
    df[df["slide_id"].astype(str).isin(test_ids)].to_csv(TMP / "test.csv", index=False)

    ref_ds = Generic_MIL_MTL_Dataset(
        data_dir=str(pt_dir),
        csv_path=str(TMP / "test.csv"),
        shuffle=False,
        print_info=False,
        label_dicts=[dict(d) for d in task.label_dicts],
        label_cols=list(task.label_cols),
        patient_strat=False,
    )
    # environmental shim: the reference's vendored `accuracy`
    # (eval_utils_mtl_concat.py:49-63) calls .view(-1) on a non-contiguous
    # tensor, which modern torch rejects; identical math with .reshape
    def _accuracy(output, target, topk=(1,)):
        with torch.no_grad():
            maxk = max(topk)
            batch_size = target.size(0)
            _, pred = output.topk(maxk, 1, True, True)
            pred = pred.t()
            correct = pred.eq(target.view(1, -1).expand_as(pred))
            return [
                correct[:k].reshape(-1).float().sum(0, keepdim=True).mul_(1.0 / batch_size)
                for k in topk
            ]

    ref_eval.accuracy = _accuracy

    ref_args = types.SimpleNamespace(drop_out=False, n_classes=18, micro_average=False)
    _, ref_out = ref_eval.eval(ref_ds, ref_args, str(ckpt_pt))

    # 4. our own eval on the same split
    ours = evaluate_split(ToadMIL(cfg.model), r["params"], test_split, batch_size=4)

    result = {
        "ref_auc": round(float(ref_out["cls_auc"]), 5),
        "ours_auc": round(float(ours.cls_auc), 5),
        "ref_top1": round(float(ref_out["top1_acc"]), 4),
        "ours_top1": round(float(ours.topk.get(1, float("nan"))), 4),
        "ref_site_auc": round(float(ref_out["site_auc"]), 5),
        "ours_site_auc": round(float(ours.site_auc), 5),
        "n_test": len(test_split),
    }
    # strongest check: per-slide probabilities agree, not just aggregates
    ref_df = ref_out["df"].set_index(ref_out["df"]["slide_id"].astype(str))
    our_df = ours.df.set_index(ours.df["slide_id"].astype(str))
    prob_cols = [f"p_{c}" for c in range(18)] + ["site_p"]
    common = ref_df.index.intersection(our_df.index)
    assert len(common) == len(test_split)
    dev = float(
        np.max(np.abs(ref_df.loc[common, prob_cols].to_numpy() - our_df.loc[common, prob_cols].to_numpy()))
    )
    result["max_per_slide_prob_dev"] = round(dev, 7)
    result["auc_gap"] = round(abs(result["ref_auc"] - result["ours_auc"]), 6)
    print(json.dumps(result))
    assert result["auc_gap"] < 2e-3, result
    # ~1e-3-level prob deviation is expected: torch CPU f32 vs TPU matmul
    # accumulation orders; metrics/rankings are unaffected
    assert dev < 5e-3, result
    return result


if __name__ == "__main__":
    main()
