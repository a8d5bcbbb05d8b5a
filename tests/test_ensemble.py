"""Mean-of-folds ensemble prediction (pipeline/infer.py::EnsembleInference).

The reference's eval loop runs one checkpoint per pass and aggregates only
metrics across folds (eval_mtl_concat.py:105,117-138); the ensemble averages
probabilities — the standard CV deployment pattern.
"""

import numpy as np
import pytest

import jax

from toad_tpu.config import ModelConfig
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.pipeline.infer import EnsembleInference, SlideInference, find_fold_checkpoints
from toad_tpu.train.checkpoint import save_checkpoint

CFG = ModelConfig(in_dim=64, n_classes=18)
BUCKETS = (64, 128, 256)


@pytest.fixture(scope="module")
def members(tmp_path_factory):
    """Two differently-initialized param trees + their on-disk checkpoints
    in the cli/train.py results layout."""
    model = ToadMIL(CFG)
    params = [model.init(jax.random.PRNGKey(k)) for k in (0, 1)]
    results_dir = tmp_path_factory.mktemp("models")
    for i, p in enumerate(params):
        save_checkpoint(results_dir / f"s_{i}_checkpoint", {"params": p, "epoch": np.int64(0)})
    return params, results_dir


@pytest.fixture(scope="module")
def bag():
    rng = np.random.RandomState(0)
    return rng.randn(100, 64).astype(np.float32)


def test_singleton_ensemble_equals_single(members, bag):
    params, _ = members
    single = SlideInference(params[0], CFG, bucket_sizes=BUCKETS).predict(bag, sex=1)
    ens = EnsembleInference(params[:1], CFG, bucket_sizes=BUCKETS).predict(bag, sex=1)
    np.testing.assert_allclose(ens.y_prob, single.y_prob, rtol=1e-6)
    assert ens.y_hat == single.y_hat
    assert ens.topk[0][0] == single.topk[0][0]


def test_mean_of_members(members, bag):
    params, _ = members
    singles = [SlideInference(p, CFG, bucket_sizes=BUCKETS).predict(bag, sex=0) for p in params]
    ens = EnsembleInference(params, CFG, bucket_sizes=BUCKETS).predict(bag, sex=0)
    np.testing.assert_allclose(
        ens.y_prob, np.mean([s.y_prob for s in singles], axis=0), rtol=1e-6
    )
    np.testing.assert_allclose(
        ens.site_prob, np.mean([s.site_prob for s in singles], axis=0), rtol=1e-6
    )
    # attention: mean of the members' softmaxed pooling weights — a proper
    # distribution over the real rows
    assert ens.attention.shape == (100,)
    np.testing.assert_allclose(ens.attention.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(ens.site_attention.sum(), 1.0, rtol=1e-6)


def test_shared_compiled_forward(members, bag):
    """All members run through ONE jit — k checkpoints, zero extra compiles."""
    params, _ = members
    ens = EnsembleInference(params, CFG, bucket_sizes=BUCKETS)
    ens.predict(bag, sex=0)
    sizes = ens._inf._fwd._cache_size()
    assert sizes == 1, sizes


def test_from_models_dir(members, bag):
    params, results_dir = members
    ens = EnsembleInference.from_models_dir(results_dir, CFG, bucket_sizes=BUCKETS)
    assert len(ens.members) == 2
    direct = EnsembleInference(params, CFG, bucket_sizes=BUCKETS).predict(bag, sex=1)
    loaded = ens.predict(bag, sex=1)
    np.testing.assert_allclose(loaded.y_prob, direct.y_prob, rtol=1e-6)


def test_from_models_dir_empty(tmp_path):
    with pytest.raises(FileNotFoundError, match="no s_<k>_checkpoint"):
        EnsembleInference.from_models_dir(tmp_path, CFG)


def test_find_fold_checkpoints_ordering(tmp_path):
    for name in ("s_10_checkpoint", "s_2_checkpoint.pt", "s_0_checkpoint", "other.pt", "s_x_checkpoint"):
        (tmp_path / name).mkdir() if "pt" not in name else (tmp_path / name).touch()
    found = find_fold_checkpoints(tmp_path)
    assert [f for f, _ in found] == [0, 2, 10]


def test_find_fold_checkpoints_dedups_fold(tmp_path):
    """A fold with BOTH an Orbax dir and a torch .pt export appears once
    (Orbax preferred) — otherwise the ensemble mean double-weights it."""
    (tmp_path / "s_0_checkpoint").mkdir()
    (tmp_path / "s_0_checkpoint.pt").touch()
    (tmp_path / "s_1_checkpoint.pt").touch()
    found = find_fold_checkpoints(tmp_path)
    assert [f for f, _ in found] == [0, 1]
    assert found[0][1].name == "s_0_checkpoint"
    assert found[1][1].name == "s_1_checkpoint.pt"


def test_from_spec_dir_with_comma_in_name(members, bag, tmp_path):
    """from_spec treats an EXISTING path as a models dir even when its name
    contains a comma (the comma-list split must not misparse it); a
    non-existent comma string still splits into member paths."""
    params, results_dir = members
    odd_dir = tmp_path / "run,v2"
    odd_dir.mkdir()
    for i in (0, 1):
        save_checkpoint(odd_dir / f"s_{i}_checkpoint", {"params": params[i], "epoch": np.int64(0)})
    ens = EnsembleInference.from_spec(odd_dir, CFG, bucket_sizes=BUCKETS)
    assert len(ens.members) == 2
    ref = EnsembleInference(params, CFG, bucket_sizes=BUCKETS).predict(bag, sex=1)
    np.testing.assert_allclose(ens.predict(bag, sex=1).y_prob, ref.y_prob, rtol=1e-6)
    lst = EnsembleInference.from_spec(
        f"{results_dir / 's_0_checkpoint'},{results_dir / 's_1_checkpoint'}",
        CFG, bucket_sizes=BUCKETS,
    )
    assert len(lst.members) == 2


def test_int8_ensemble(members, bag):
    params, _ = members
    f32 = EnsembleInference(params, CFG, bucket_sizes=BUCKETS).predict(bag, sex=0)
    q = EnsembleInference(params, CFG, bucket_sizes=BUCKETS, int8=True).predict(bag, sex=0)
    np.testing.assert_allclose(q.y_prob, f32.y_prob, atol=0.02)
    assert q.y_hat == f32.y_hat


def test_ensemble_infer_feature_bag(members, bag, tmp_path):
    """EnsembleInference is duck-compatible with the bag-level entry point."""
    from toad_tpu.pipeline.infer import infer_feature_bag

    params, _ = members
    np.save(tmp_path / "slideX.npy", bag)
    ens = EnsembleInference(params, CFG, bucket_sizes=BUCKETS)
    pred, coords = infer_feature_bag(ens, tmp_path / "slideX.npy", sex=1)
    direct = ens.predict(bag, sex=1)
    np.testing.assert_allclose(pred.y_prob, direct.y_prob, rtol=1e-6)
    assert coords is None


def test_evaluate_cli_ensemble(tmp_path):
    """evaluate --split all --ensemble: per-slide mean of the fold probability
    matrices, scored with the engine's metric semantics, appended as an
    'ensemble' summary row."""
    import os

    import pandas as pd

    from toad_tpu.cli import evaluate, make_dummy

    root = tmp_path / "env"
    make_dummy.main([
        "--out_dir", str(root), "--n_patients", "30", "--max_slides_per_patient", "1",
        "--min_patches", "32", "--max_patches", "96", "--dim", "64", "--seed", "3",
    ])
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")

    models_dir = tmp_path / "results" / "ens_s1"
    models_dir.mkdir(parents=True)
    model = ToadMIL(CFG)
    for i in (0, 1):
        save_checkpoint(models_dir / f"s_{i}_checkpoint",
                        {"params": model.init(jax.random.PRNGKey(i)), "epoch": np.int64(0)})

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        # per-fold splits (val slides feed --ensemble --calibrate's fit mask);
        # splits_dir defaults to models_dir
        manifest = pd.read_csv(root / "dataset_csv" / "dummy_dataset.csv")
        sids = list(manifest["slide_id"])
        from toad_tpu.data.splits import save_split_columnar

        for fold in (0, 1):
            save_split_columnar(
                {"train": sids[: len(sids) // 2], "val": sids[len(sids) // 2: 3 * len(sids) // 4],
                 "test": sids[3 * len(sids) // 4:]} if fold == 0 else
                {"train": sids[len(sids) // 2:], "val": sids[: len(sids) // 4],
                 "test": sids[len(sids) // 4: len(sids) // 2]},
                models_dir / f"splits_{fold}.csv",
            )

        df = evaluate.main([
            "--task", task_json, "--data_root_dir", str(root / "bags"),
            "--results_dir", str(tmp_path / "results"), "--models_exp_code", "ens_s1",
            "--save_exp_code", "ens_eval", "--k", "2", "--split", "all",
            "--encoding_size", "64", "--batch_size", "4", "--ensemble",
            "--buckets", "128,256", "--calibrate",
        ])
        assert list(df["folds"]) == [0, 1, "ensemble"]
        save_dir = tmp_path / "eval_results" / "EVAL_ens_eval"
        e = pd.read_csv(save_dir / "ensemble.csv")
        f0 = pd.read_csv(save_dir / "fold_0.csv")
        f1 = pd.read_csv(save_dir / "fold_1.csv")
        pcols = [c for c in e.columns if c.startswith("p_")]
        np.testing.assert_allclose(
            e[pcols].to_numpy(), (f0[pcols].to_numpy() + f1[pcols].to_numpy()) / 2, atol=1e-8
        )
        assert (e["Y_hat"] == e[pcols].to_numpy().argmax(axis=1)).all()
        ens_row = df[df["folds"] == "ensemble"].iloc[0]
        assert np.isfinite(ens_row["cls_test_auc"])

        # --calibrate on the ensemble (VERDICT r4 #5): ONE temperature fitted
        # on the val-union with the deployment transform, ECE before/after
        import json as _json

        from toad_tpu.evaluate.calibration import (
            apply_ensemble_temperature, ensemble_calibration_report,
        )

        cal = _json.loads((save_dir / "ensemble_calibration.json").read_text())
        assert cal["n_members"] == 2 and cal["temperature"] > 0
        assert {"ece_before", "ece_after", "nll_before", "nll_after",
                "fit_ece_before", "fit_ece_after"} <= set(cal)
        assert "Deploy with serve/infer" in cal["note"]
        # reproduce the fit from the written fold CSVs: same T
        member = np.stack([f0[pcols].to_numpy(), f1[pcols].to_numpy()])
        labels = f0["Y"].to_numpy().astype(int)
        val_union = set(pd.read_csv(models_dir / "splits_0.csv")["val"].dropna()) | set(
            pd.read_csv(models_dir / "splits_1.csv")["val"].dropna()
        )
        mask = f0["slide_id"].isin(val_union).to_numpy()
        want = ensemble_calibration_report(member, labels, mask)
        assert abs(cal["temperature"] - want["temperature"]) < 1e-6
        # deployment parity: EnsembleInference at the fitted T reproduces the
        # calibrated mixture on one slide (member softmax at T, THEN mean)
        cal_probs = apply_ensemble_temperature(member, cal["temperature"])
        np.testing.assert_allclose(cal_probs.sum(axis=1), 1.0, atol=1e-9)
    finally:
        os.chdir(cwd)

    # guards: wrong split / single fold refuse before any work
    with pytest.raises(SystemExit, match="split all"):
        evaluate.main(["--task", task_json, "--data_root_dir", str(root / "bags"),
                       "--results_dir", str(tmp_path / "results"), "--models_exp_code", "ens_s1",
                       "--k", "2", "--split", "test", "--ensemble"])
    with pytest.raises(SystemExit, match="two folds"):
        evaluate.main(["--task", task_json, "--data_root_dir", str(root / "bags"),
                       "--results_dir", str(tmp_path / "results"), "--models_exp_code", "ens_s1",
                       "--k", "2", "--fold", "0", "--split", "all", "--ensemble"])


def test_predict_cli_ensemble(members, bag, tmp_path):
    """--ensemble over a results dir and over a comma list agree."""
    import pandas as pd

    from toad_tpu.cli import predict

    params, results_dir = members
    data_dir = tmp_path / "bags"
    data_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        np.save(data_dir / f"s{i}.npy", rng.randn(80 + i, 64).astype(np.float32))

    out1 = tmp_path / "ens_dir.csv"
    predict.main([
        "--ckpt", str(results_dir), "--ensemble",
        "--data_dir", str(data_dir), "--out", str(out1),
        "--encoding_size", "64", "--sex", "F", "--buckets", "128,256",
    ])
    out2 = tmp_path / "ens_list.csv"
    predict.main([
        "--ckpt", f"{results_dir / 's_0_checkpoint'},{results_dir / 's_1_checkpoint'}",
        "--ensemble",
        "--data_dir", str(data_dir), "--out", str(out2),
        "--encoding_size", "64", "--sex", "F", "--buckets", "128,256",
    ])
    a, b = pd.read_csv(out1), pd.read_csv(out2)
    assert list(a["slide_id"]) == ["s0", "s1", "s2"]
    pcols = [c for c in a.columns if c.startswith("p_")]
    np.testing.assert_allclose(a[pcols].values, b[pcols].values, rtol=1e-6)
    np.testing.assert_allclose(a[pcols].sum(axis=1), 1.0, rtol=1e-5)


def test_infer_cli_ensemble(members, bag, tmp_path, capsys):
    """infer --ensemble: top-k probabilities equal EnsembleInference's mean,
    and attention (the heatmap source) is the mean of softmaxed weights."""
    import json

    from toad_tpu.cli import infer as infer_cli

    params, results_dir = members
    bag_path = tmp_path / "one.npy"
    np.save(bag_path, bag)

    infer_cli.main([
        "--ckpt", str(results_dir), "--ensemble", "--bag", str(bag_path),
        "--sex", "F", "--encoding_size", "64", "--buckets", "128,256", "--topk", "18",
    ])
    out = json.loads(capsys.readouterr().out)

    ens = EnsembleInference(params, CFG, bucket_sizes=(128, 256))
    ref = ens.predict(bag, 0)
    assert out["y_hat"] == ref.y_hat
    got = {int(t["class"]): t["prob"] for t in out["topk"]}
    for ci, p in ref.topk:
        assert abs(got[ci] - p) < 1e-5, ci
    assert out["n_patches"] == len(ref.attention)


def test_infer_cli_temperature_from(members, bag, tmp_path, capsys):
    """--temperature_from reads the T fitted by evaluate --calibrate and
    matches an explicit --temperature; conflicting flags refuse."""
    import json

    from toad_tpu.cli import infer as infer_cli

    _, results_dir = members
    bag_path = tmp_path / "one.npy"
    np.save(bag_path, bag)
    cal_json = tmp_path / "ensemble_calibration.json"
    cal_json.write_text(json.dumps({"temperature": 2.5, "ece_before": 0.2}))

    base = ["--ckpt", str(results_dir), "--ensemble", "--bag", str(bag_path),
            "--sex", "F", "--encoding_size", "64", "--buckets", "128,256", "--topk", "18"]
    def run(argv):
        infer_cli.main(argv)
        out = capsys.readouterr().out
        # drop resolve_temperature's echo line; the rest is the JSON blob
        return json.loads("\n".join(
            ln for ln in out.splitlines() if not ln.startswith("temperature ")
        ))

    got = run(base + ["--temperature_from", str(cal_json)])
    want = run(base + ["--temperature", "2.5"])
    assert got["topk"] == want["topk"]

    with pytest.raises(SystemExit, match="not both"):
        infer_cli.main(base + ["--temperature", "2.0", "--temperature_from", str(cal_json)])
    with pytest.raises(SystemExit, match="does not exist"):
        infer_cli.main(base + ["--temperature_from", str(tmp_path / "nope.json")])
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"ece_before": 0.2}))
    with pytest.raises(SystemExit, match="no 'temperature' key"):
        infer_cli.main(base + ["--temperature_from", str(bad)])
