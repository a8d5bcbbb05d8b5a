"""Dataset core: CSV ingest, label validation, patient aggregation, splits views."""

import numpy as np
import pandas as pd
import pytest

from toad_tpu.config import TaskConfig
from toad_tpu.data.wsi_dataset import LabelVocabularyError, WSIBagDataset


def test_ingest_and_mapping(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    assert ds.n_slides == len(dummy_env["manifest"])
    assert ds.labels.min() >= 0 and ds.labels.max() < 18
    assert set(np.unique(ds.sites)) <= {0, 1}
    assert set(np.unique(ds.sexes)) <= {0, 1}
    # class index caches partition the slides
    assert sum(len(c) for c in ds.slide_cls_ids) == ds.n_slides


def test_vocabulary_drift_fails_loudly(dummy_env, tmp_path):
    """The reference's label-dict/CSV drift (SURVEY §2.3.4) must be a clear error."""
    bad_dicts = list(dummy_env["task"].label_dicts)
    d0 = dict(bad_dicts[0])
    d0.pop("Lung")
    d0["Lunge"] = 0
    bad_task = TaskConfig(name="bad", csv_path=str(dummy_env["csv"]), label_dicts=(d0, *bad_dicts[1:]))
    with pytest.raises(LabelVocabularyError, match="Lung"):
        WSIBagDataset(bad_task)


def test_missing_column_fails(tmp_path, dummy_env):
    df = pd.read_csv(dummy_env["csv"]).drop(columns=["site"])
    p = tmp_path / "nosite.csv"
    df.to_csv(p, index=False)
    with pytest.raises(LabelVocabularyError, match="site"):
        WSIBagDataset(dummy_env["task"], csv_path=p)


def test_patient_voting_max(dummy_env):
    ds = WSIBagDataset(dummy_env["task"])
    # every patient label is the max over their slides
    for p, plabel in zip(ds.patient_ids, ds.patient_labels):
        slide_labels = ds.labels[ds.case_ids == p]
        assert plabel == slide_labels.max()


def test_filter_dict(dummy_env):
    ds_all = WSIBagDataset(dummy_env["task"])
    ds_f = WSIBagDataset(dummy_env["task"], filter_dict={"sex": ["F"]})
    assert 0 < ds_f.n_slides < ds_all.n_slides
    assert (ds_f.sexes == 0).all()


def test_subset_and_class_weights(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    sub = ds.subset(np.arange(20))
    assert len(sub) == 20
    w = sub.class_weights()
    assert w.shape == (20,)
    assert (w > 0).all()
    # rarer classes get larger weights
    counts = np.bincount(sub.labels, minlength=18)
    for i in range(20):
        assert np.isclose(w[i], len(sub) / counts[sub.labels[i]])


def test_bag_loading_roundtrip(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    bag = ds.load_bag(0)
    assert bag.ndim == 2 and bag.shape[1] == dummy_env["dim"]
    assert bag.dtype == np.float32


def test_subset_by_slide_ids(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    wanted = list(ds.slide_ids[5:10])
    sub = ds.subset_by_slide_ids(wanted)
    assert sorted(sub.slide_ids) == sorted(wanted)


def test_multi_source_data_dir_routing(tmp_path):
    """data_dir as a {source: dir} mapping routes each slide's bag load by
    the CSV's `source` column (reference dataset_mtl_concat.py:364-368)."""
    import pandas as pd

    from toad_tpu.data.synthetic import dummy_task
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        src = "site_a" if i % 2 == 0 else "site_b"
        rows.append({"slide_id": f"S{i}", "case_id": f"P{i}", "label": "Lung",
                     "site": "Primary", "sex": "F", "source": src})
    csv = tmp_path / "multi.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    dirs = {"site_a": tmp_path / "a", "site_b": tmp_path / "b"}
    for d in dirs.values():
        d.mkdir()
    bags = {}
    for i in range(6):
        d = dirs["site_a" if i % 2 == 0 else "site_b"]
        bags[f"S{i}"] = rng.randn(10 + i, 8).astype(np.float32)
        np.save(d / f"S{i}.npy", bags[f"S{i}"])

    task = dummy_task(str(csv))
    ds = WSIBagDataset(task, data_dir={k: str(v) for k, v in dirs.items()}, print_info=False)
    for i in range(6):
        np.testing.assert_array_equal(ds.load_bag(i), bags[str(ds.slide_ids[i])])

    # mapping without a source column fails loudly
    df2 = pd.DataFrame(rows).drop(columns=["source"])
    csv2 = tmp_path / "nosrc.csv"
    df2.to_csv(csv2, index=False)
    ds2 = WSIBagDataset(dummy_task(str(csv2)), data_dir={k: str(v) for k, v in dirs.items()}, print_info=False)
    with pytest.raises(ValueError, match="source"):
        ds2.load_bag(0)


def test_graded_bags_deterministic_and_learnable(dummy_env, tmp_path):
    """`write_graded_bags` (the fixture-scale parity generator): one file per
    manifest row with shapes in range, byte-identical regeneration for the
    same seed (the parity harness relies on both sides seeing the SAME
    bags), and an aggregate class-direction signal (graded, not saturated)."""
    from toad_tpu.data.synthetic import class_direction_matrix, write_graded_bags

    manifest = dummy_env["manifest"].head(40)
    task = dummy_env["task"]
    kw = dict(n_patches_range=(64, 128), dim=48, seed=5)
    a, b = tmp_path / "a", tmp_path / "b"
    write_graded_bags(a, manifest, task, **kw)
    write_graded_bags(b, manifest, task, **kw)

    label_map = task.label_dicts[0]
    dirs = class_direction_matrix(len(set(label_map.values())), 48, seed=5 + 7)
    own, other = [], []
    for _, row in manifest.iterrows():
        fa = np.load(a / f"{row['slide_id']}.npy")
        np.testing.assert_array_equal(fa, np.load(b / f"{row['slide_id']}.npy"))
        assert fa.shape[1] == 48 and 64 <= fa.shape[0] <= 128
        proj = fa @ dirs.T  # [n_patches, n_classes]
        c = label_map[row["label"]]
        own.append(proj[:, c].max())
        other.append(np.delete(proj, c, axis=1).max(axis=1).mean())
    # aggregate signal along the slide's own class direction (blank slides
    # and confusable groups keep it graded, but the mean margin is positive)
    assert np.mean(own) > np.mean(other) + 0.3

    with pytest.raises(ValueError, match="npy"):
        write_graded_bags(tmp_path / "c", manifest.head(1), task, fmt="h5")
