"""Multi-slide-per-patient concat bags (BASELINE.json stretch config)."""

import numpy as np

from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from toad_tpu.data.batching import BagBatcher
from toad_tpu.data.wsi_dataset import PatientBagSplit, WSIBagDataset
from toad_tpu.train.loop import FoldTrainer


def _ds(dummy_env):
    return WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]), print_info=False)


def test_concat_and_voting(dummy_env):
    ds = _ds(dummy_env)
    split = ds.subset(np.arange(ds.n_slides))
    pb = PatientBagSplit(split)
    assert len(pb) == len(np.unique(ds.case_ids))

    # pick a patient with >1 slide and check exact concatenation order
    multi = next(i for i, g in enumerate(pb.groups) if len(g) > 1)
    parts = [np.asarray(split.load_bag(int(j)), np.float32) for j in pb.groups[multi]]
    bag = pb.load_bag(multi)
    np.testing.assert_array_equal(bag, np.concatenate(parts, axis=0))
    assert len(pb.slides_for(multi)) == len(pb.groups[multi])

    # max-voting labels; site is max; sex constant per patient
    g = pb.groups[multi]
    assert pb.labels[multi] == split.labels[g].max()
    assert pb.sites[multi] == split.sites[g].max()
    assert pb.sexes[multi] == split.sexes[g[0]]


def test_batcher_over_patient_bags(dummy_env):
    ds = _ds(dummy_env)
    pb = PatientBagSplit(ds.subset(np.arange(ds.n_slides)))
    batcher = BagBatcher(pb, batch_size=4, bucket_sizes=(128, 256, 512, 1024), prefetch=0)
    total = 0
    for b in batcher:
        total += int(b.bag_mask.sum())
        assert b.features.shape[2] == dummy_env["dim"]
        # every real bag's mask count equals its concat length (unless truncated)
        for j in range(b.batch_size):
            if b.bag_mask[j]:
                n_concat = sum(len(np.asarray(pb.parent.load_bag(int(k)))) for k in pb.groups[int(b.indices[j])])
                assert int(b.patch_mask[j].sum()) == min(n_concat, b.bucket)
    assert total == len(pb)
    # r4: multi-file bags pack through the native SEGMENT path (one pread
    # per slide file at its cumulative row offset) when every part resolves
    assert batcher.native_active is True


def test_training_with_patient_bags(dummy_env, tmp_path):
    ds = _ds(dummy_env)
    n = ds.n_slides
    rng = np.random.RandomState(0)
    ids = rng.permutation(n)
    tr, va, te = ds.subset(ids[: n - 24]), ds.subset(ids[n - 24 : n - 12]), ds.subset(ids[n - 12 :])
    cfg = TrainConfig(
        max_epochs=2,
        seed=1,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        optim=OptimConfig(lr=3e-4),
        data=DataConfig(batch_size=4, bucket_sizes=(128, 256, 512, 1024), patient_bags=True),
    )
    r = FoldTrainer(cfg, fold=0, results_dir=tmp_path).train(tr, va, te, log_fn=lambda s: None)
    assert np.isfinite(r["cls_test_auc"])
    # the split snapshot stays slide-level (patient grouping happens at
    # batch time), so membership is reproducible from the snapshot alone
    snap = (tmp_path / "splits_0.csv").read_text()
    assert "SLIDE" in snap
    # patient_results must be keyed by CASE ids (the bag identity), not by
    # arbitrary slide ids indexed with patient-level indices
    keys = list(r["results"].keys())
    assert keys and all("PATIENT" in k for k in keys), keys[:3]


def test_eval_engine_over_patient_bags(dummy_env, tmp_path):
    import jax

    from toad_tpu.evaluate.engine import evaluate_split
    from toad_tpu.models.toad_mil import ToadMIL

    ds = _ds(dummy_env)
    pb = PatientBagSplit(ds.subset(np.arange(ds.n_slides)))
    cfg = ModelConfig(in_dim=dummy_env["dim"], n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    res = evaluate_split(model, params, pb, batch_size=4, bucket_sizes=(128, 256, 512, 1024))
    assert len(res.df) == len(pb)
    # per-row ids are case ids, one row per patient
    assert res.df["slide_id"].str.contains("PATIENT").all()


def test_evaluate_cli_patient_bags_calibrate(dummy_env, tmp_path):
    """evaluate --patient_bags --calibrate --bootstrap end-to-end: T is
    fitted on the PATIENT-granularity val split (same bag semantics as the
    evaluated split) and all three artifacts land."""
    import json

    from toad_tpu.cli import evaluate as eval_cli

    ds = _ds(dummy_env)
    n = ds.n_slides
    rng = np.random.RandomState(3)
    ids = rng.permutation(n)
    tr, va, te = ds.subset(ids[: n - 24]), ds.subset(ids[n - 24 : n - 12]), ds.subset(ids[n - 12 :])
    results = tmp_path / "pb_s1"
    results.mkdir()
    cfg = TrainConfig(
        max_epochs=1,
        seed=1,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        optim=OptimConfig(lr=3e-4),
        data=DataConfig(batch_size=4, bucket_sizes=(128, 256, 512, 1024), patient_bags=True),
    )
    FoldTrainer(cfg, fold=0, results_dir=results).train(tr, va, te, log_fn=lambda s: None)

    task_json = tmp_path / "task.json"
    task_json.write_text(dummy_env["task"].to_json())
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)  # eval_results/ lands under tmp
    try:
        edf = eval_cli.main(
            ["--task", str(task_json), "--data_root_dir", str(dummy_env["data_dir"]),
             "--results_dir", str(tmp_path), "--models_exp_code", "pb_s1",
             "--save_exp_code", "pb_eval", "--k", "1", "--batch_size", "4",
             "--encoding_size", str(dummy_env["dim"]), "--patient_bags",
             "--calibrate", "--bootstrap", "20"]
        )
    finally:
        os.chdir(cwd)
    assert len(edf) == 1
    out = tmp_path / "eval_results" / "EVAL_pb_eval"
    cal = json.loads((out / "fold_0_calibration.json").read_text())
    assert cal["temperature"] > 0
    ci = json.loads((out / "fold_0_ci.json").read_text())
    assert ci["cls_auc"]["n_boot"] == 20
    # per-row ids in the fold CSV are patient/case ids (patient granularity)
    import pandas as pd

    fdf = pd.read_csv(out / "fold_0.csv")
    assert fdf["slide_id"].str.contains("PATIENT").all()


def test_patient_bags_native_all_wires(dummy_env):
    """Native segmented packing equals the numpy path on every wire dtype:
    the exact concat layout, masks, and (int8) scales per patient bag."""
    ds = _ds(dummy_env)
    pb = PatientBagSplit(ds.subset(np.arange(ds.n_slides)))
    for wire in ("float32", "bfloat16", "int8"):
        kw = dict(batch_size=3, bucket_sizes=(256, 512, 1024), prefetch=0,
                  mode="sequential", transfer_dtype=wire)
        b_nat = BagBatcher(pb, native="on", **kw)
        nat = list(b_nat)
        assert b_nat.native_active is True, wire
        py = list(BagBatcher(pb, native="off", **kw))
        assert len(nat) == len(py) > 0
        for a, c in zip(nat, py):
            assert a.features.dtype == c.features.dtype
            np.testing.assert_array_equal(np.asarray(a.features), np.asarray(c.features))
            np.testing.assert_array_equal(a.patch_mask, c.patch_mask)
            if wire == "int8":
                np.testing.assert_array_equal(a.scales, c.scales)


def test_patient_bags_native_max_bag_size_truncates_mid_segment(dummy_env):
    """max_bag_size smaller than a patient's total rows must truncate the
    CONCATENATED bag (possibly mid-slide-file), exactly like the numpy path."""
    ds = _ds(dummy_env)
    pb = PatientBagSplit(ds.subset(np.arange(ds.n_slides)))
    multi = next(i for i, g in enumerate(pb.groups) if len(g) > 1)
    total = pb.load_bag(multi).shape[0]
    first = np.asarray(pb.parent.load_bag(int(pb.groups[multi][0]))).shape[0]
    cap = first + max(1, (total - first) // 2)  # cuts inside a later segment
    kw = dict(batch_size=1, bucket_sizes=(cap,), max_bag_size=cap, prefetch=0,
              mode="sequential")
    for a, c in zip(BagBatcher(pb, native="on", **kw), BagBatcher(pb, native="off", **kw)):
        np.testing.assert_array_equal(np.asarray(a.features), np.asarray(c.features))
        np.testing.assert_array_equal(a.patch_mask, c.patch_mask)


def test_patient_bags_native_int8_store_segments(dummy_env, tmp_path):
    """Patient bags whose slides live in an int8 STORE: segments read
    through raw on the int8 wire and match the python dequant+requant."""
    from toad_tpu.data.bags import save_int8_bag
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    ds = _ds(dummy_env)
    store = tmp_path / "store"
    for i in range(ds.n_slides):
        bag = np.asarray(ds.subset([i]).load_bag(0), np.float32)
        save_int8_bag(store / f"{ds.slide_ids[i]}.npz", bag)
    ds_q = WSIBagDataset(dummy_env["task"], data_dir=str(store), print_info=False)
    pb = PatientBagSplit(ds_q.subset(np.arange(ds_q.n_slides)))
    kw = dict(batch_size=3, bucket_sizes=(256, 512, 1024), prefetch=0,
              mode="sequential", transfer_dtype="int8")
    b_nat = BagBatcher(pb, native="on", **kw)
    nat = list(b_nat)
    assert b_nat.native_active is True
    for a, c in zip(nat, BagBatcher(pb, native="off", **kw)):
        np.testing.assert_array_equal(np.asarray(a.features), np.asarray(c.features))
        np.testing.assert_array_equal(a.scales, c.scales)
        np.testing.assert_array_equal(a.patch_mask, c.patch_mask)
