"""Drop-in interop with the artifacts the reference actually SHIPS.

The reference's own fixture CSV (``/root/reference/dataset_csv/dummy_dataset.csv``)
uses the misspelling ``Esophagogogastric`` — a vocabulary the reference's own
CLIs crash on (SURVEY §2.3.4). Capability parity means THIS framework must run
those shipped artifacts as-is (MIGRATION.md "dataset CSV read as-is"): the
builtin task maps both spellings to class 10, the prebuilt split
``splits/dummy_mtl_concat_100/splits_0.csv`` is consumed directly
(reference consumption semantics: ``dataset_mtl_concat.py:221-238``), and the
train/eval CLIs run a full fold against them (VERDICT r1 missing #2).
"""

import dataclasses
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference")
REF_CSV = REF / "dataset_csv" / "dummy_dataset.csv"
REF_SPLITS = REF / "splits" / "dummy_mtl_concat_100"

pytestmark = pytest.mark.skipif(not REF_CSV.exists(), reason="reference checkout not mounted")

DIM = 32  # tiny bags keep the full-2042-slide e2e fast


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    from toad_tpu.data.synthetic import write_dummy_bags
    from toad_tpu.registry import load_task

    root = tmp_path_factory.mktemp("ref_fixture")
    task = dataclasses.replace(load_task("dummy_mtl_concat"), csv_path=str(REF_CSV))
    manifest = pd.read_csv(REF_CSV)
    bags = root / "bags"
    write_dummy_bags(bags, manifest, task, n_patches_range=(8, 24), dim=DIM, fmt="npy", seed=0)
    return {"root": root, "task": task, "bags": bags, "manifest": manifest}


def test_reference_csv_loads_as_is(ref_env):
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    ds = WSIBagDataset(ref_env["task"], data_dir=str(ref_env["bags"]), print_info=False)
    assert ds.n_slides == 2042
    assert ds.num_classes[0] == 18  # the alias must NOT add a 19th class
    # every misspelled row maps to the same class as the clean spelling
    man = ref_env["manifest"]
    mis = man.index[man["label"] == "Esophagogogastric"].to_numpy()
    assert len(mis) == 115
    sid_to_idx = {s: i for i, s in enumerate(ds.slide_ids)}
    for row in man.iloc[mis[:5]].itertuples():
        assert ds.labels[sid_to_idx[row.slide_id]] == 10


def test_reference_prebuilt_split_consumed_as_is(ref_env):
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    ds = WSIBagDataset(ref_env["task"], data_dir=str(ref_env["bags"]), print_info=False)
    train, val, test = ds.return_splits_from_csv(REF_SPLITS / "splits_0.csv")
    assert (len(train.slide_ids), len(val.slide_ids), len(test.slide_ids)) == (1532, 168, 342)
    sets = [set(s.slide_ids) for s in (train, val, test)]
    assert not (sets[0] & sets[1]) and not (sets[0] & sets[2]) and not (sets[1] & sets[2])


def test_cli_train_and_eval_on_shipped_artifacts(ref_env, monkeypatch):
    """The README demo workflow (docs/README.md:42-114) end-to-end on the
    reference's shipped CSV + prebuilt split dir, via our CLIs."""
    from toad_tpu.cli import evaluate as eval_cli
    from toad_tpu.cli import train as train_cli

    root = ref_env["root"]
    monkeypatch.chdir(root)  # eval writes ./eval_results
    train_cli.main(
        [
            "--task", "dummy_mtl_concat",
            "--csv_path", str(REF_CSV),
            "--data_root_dir", str(ref_env["bags"]),
            "--split_dir", str(REF_SPLITS),
            "--results_dir", str(root / "results"),
            "--exp_code", "refinterop",
            "--k", "1",
            "--max_epochs", "1",
            "--encoding_size", str(DIM),
            "--batch_size", "64",
        ]
    )
    results_dir = root / "results" / "refinterop_s1"
    assert (results_dir / "s_0_checkpoint").exists()
    summary = pd.read_csv(results_dir / "summary.csv")
    assert np.isfinite(summary["cls_test_auc"].iloc[0])

    eval_cli.main(
        [
            "--task", "dummy_mtl_concat",
            "--csv_path", str(REF_CSV),
            "--data_root_dir", str(ref_env["bags"]),
            "--splits_dir", str(REF_SPLITS),
            "--results_dir", str(root / "results"),
            "--models_exp_code", "refinterop_s1",
            "--k", "1",
            "--fold", "0",
            "--encoding_size", str(DIM),
            "--batch_size", "64",
        ]
    )
    fold_df = pd.read_csv(root / "eval_results" / "EVAL_refinterop_s1_eval" / "fold_0.csv")
    assert len(fold_df) == 342  # the shipped split's test membership, exactly
    assert list(fold_df.columns[:6]) == ["slide_id", "sex", "Y", "Y_hat", "site", "site_hat"]


def test_alias_inversion_prefers_canonical_name():
    """The shipped task maps both 'Esophagogastric' (canonical) and the
    fixture CSV's 'Esophagogogastric' misspelling to class 10; every
    index->name inversion must display the canonical spelling."""
    from toad_tpu.registry import load_task
    from toad_tpu.utils import invert_labels

    task = load_task("dummy_mtl_concat")
    assert task.label_dicts[0]["Esophagogastric"] == 10
    assert task.label_dicts[0]["Esophagogogastric"] == 10
    inv = invert_labels(task.label_dicts[0])
    assert inv[10] == "Esophagogastric"
    assert len(inv) == 18


def test_reference_bool_split_file_loads_identically():
    """The reference's own prebuilt one-hot split file
    (splits/dummy_mtl_concat_100/splits_0_bool.csv) resolves to exactly the
    same membership as its columnar twin — a format the reference writes
    (dataset_mtl_concat.py:21-26) but cannot read back."""
    from toad_tpu.data.splits import load_split_csv

    base = REF_SPLITS
    a = load_split_csv(base / "splits_0.csv")
    b = load_split_csv(base / "splits_0_bool.csv")
    assert {k: sorted(v) for k, v in a.items()} == {k: sorted(v) for k, v in b.items()}
    assert len(b["train"]) == 1532 and len(b["val"]) == 168 and len(b["test"]) == 342
