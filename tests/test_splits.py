"""Split generation determinism, stratification, and file-format round-trips."""

import numpy as np
import pandas as pd

from toad_tpu.data.splits import (
    SplitSpec,
    generate_splits,
    load_split_csv,
    sample_held_out,
    save_split_boolean,
    save_split_columnar,
    split_descriptor,
)
from toad_tpu.data.wsi_dataset import WSIBagDataset


def _cls_ids(n_classes, per_class):
    return [np.arange(c * per_class, (c + 1) * per_class) for c in range(n_classes)]


def test_determinism_and_stratification():
    cls_ids = _cls_ids(4, 30)
    kw = dict(val_num=[3] * 4, test_num=[6] * 4, samples=120, n_splits=3, seed=7)
    a = [s for s in generate_splits(cls_ids, **kw)]
    b = [s for s in generate_splits(cls_ids, **kw)]
    for s1, s2 in zip(a, b):
        np.testing.assert_array_equal(s1.train, s2.train)
        np.testing.assert_array_equal(s1.val, s2.val)
        np.testing.assert_array_equal(s1.test, s2.test)
    for s in a:
        s.validate_disjoint()
        assert len(s.val) == 12 and len(s.test) == 24 and len(s.train) == 84
        # per-class stratification exact
        for c in range(4):
            assert np.isin(s.val, cls_ids[c]).sum() == 3
            assert np.isin(s.test, cls_ids[c]).sum() == 6


def test_label_frac_ceil():
    cls_ids = _cls_ids(2, 20)
    s = next(generate_splits(cls_ids, [2, 2], [4, 4], 40, n_splits=1, seed=1, label_frac=0.5))
    # per class remaining = 14, ceil(14*0.5) = 7 each
    assert len(s.train) == 14


def test_custom_test_ids_respected():
    cls_ids = _cls_ids(2, 20)
    held = sample_held_out(cls_ids, [5, 5], seed=3)
    s = next(generate_splits(cls_ids, [2, 2], [0, 0], 40, n_splits=1, seed=1, custom_test_ids=held))
    np.testing.assert_array_equal(np.sort(s.test), np.sort(held))
    assert not np.intersect1d(s.train, held).size
    assert not np.intersect1d(s.val, held).size


def test_columnar_roundtrip(tmp_path):
    ids = {"train": [f"s{i}" for i in range(10)], "val": ["s10", "s11"], "test": ["s12", "s13", "s14"]}
    p = tmp_path / "splits_0.csv"
    save_split_columnar(ids, p)
    loaded = load_split_csv(p)
    assert loaded == {k: list(v) for k, v in ids.items()}


def test_boolean_format(tmp_path):
    ids = {"train": ["a", "b"], "val": ["c"], "test": ["d", "e"]}
    p = tmp_path / "splits_0_bool.csv"
    save_split_boolean(ids, p)
    df = pd.read_csv(p, index_col=0)
    assert df.shape == (5, 3)
    assert df["train"].sum() == 2 and df["val"].sum() == 1 and df["test"].sum() == 2
    assert bool(df.loc["c", "val"]) is True


def test_descriptor_counts(dummy_env, tmp_path):
    ds = WSIBagDataset(dummy_env["task"])
    n0 = ds.num_classes[0]
    spec = next(
        generate_splits(
            ds.slide_cls_ids,
            val_num=np.maximum((np.bincount(ds.labels, minlength=n0) * 0.1).astype(int), 0),
            test_num=np.maximum((np.bincount(ds.labels, minlength=n0) * 0.2).astype(int), 0),
            samples=ds.n_slides,
            n_splits=1,
            seed=1,
        )
    )
    df = split_descriptor(spec, ds.getlabel, ds.task.label_dicts, ds.num_classes)
    # stacked over 3 tasks: 18 + 2 + 2 rows
    assert df.shape == (22, 3)
    assert df["train"].iloc[:18].sum() == len(spec.train)
    assert df["test"].iloc[:18].sum() == len(spec.test)


def test_return_splits_from_csv(dummy_env, tmp_path):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    ids = {
        "train": list(ds.slide_ids[:30]),
        "val": list(ds.slide_ids[30:40]),
        "test": list(ds.slide_ids[40:55]),
    }
    p = tmp_path / "splits_0.csv"
    save_split_columnar(ids, p)
    train, val, test = ds.return_splits_from_csv(p)
    assert len(train) == 30 and len(val) == 10 and len(test) == 15
    assert sorted(val.slide_ids) == sorted(ids["val"])


def test_load_split_csv_reads_bool_format(tmp_path):
    """The one-hot splits_i_bool.csv round-trips: the reference writes this
    format (dataset_mtl_concat.py:21-26) but has no reader for it."""
    from toad_tpu.data.splits import load_split_csv, save_split_boolean, save_split_columnar

    ids = {
        "train": [f"S{i}" for i in range(6)],
        "val": ["S6", "S7"],
        "test": ["S8", "S9", "S10"],
    }
    save_split_boolean(ids, tmp_path / "splits_0_bool.csv")
    got = load_split_csv(tmp_path / "splits_0_bool.csv")
    assert got == ids

    # columnar file with all-numeric ids still reads as ids, not booleans
    num = {"train": ["0", "1"], "val": ["1"], "test": ["0"]}
    save_split_columnar(num, tmp_path / "splits_1.csv")
    got2 = load_split_csv(tmp_path / "splits_1.csv")
    assert got2 == num
