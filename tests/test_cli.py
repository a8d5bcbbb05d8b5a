"""CLI entry points: make_dummy → create_splits → train → evaluate, end to end."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory, monkeypatch_module=None):
    from toad_tpu.cli import make_dummy

    root = tmp_path_factory.mktemp("cli")
    make_dummy.main(
        [
            "--out_dir", str(root),
            "--n_patients", "50",
            "--max_slides_per_patient", "2",
            "--min_patches", "32",
            "--max_patches", "128",
            "--dim", "64",
            "--seed", "0",
        ]
    )
    return root


def test_full_cli_pipeline(cli_env, tmp_path):
    from toad_tpu.cli import create_splits, evaluate, train

    root = cli_env
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        split_dir = create_splits.main(
            ["--task", task_json, "--k", "2", "--seed", "1", "--val_frac", "0.15", "--test_frac", "0.2"]
        )
        for i in range(2):
            for suffix in ("", "_bool", "_descriptor"):
                assert (root / split_dir / f"splits_{i}{suffix}.csv").exists()

        df = train.main(
            [
                "--task", task_json,
                "--data_root_dir", str(root / "bags"),
                "--exp_code", "smoke",
                "--k", "2",
                "--k_end", "1",  # one fold for speed
                "--max_epochs", "4",
                "--lr", "3e-4",
                "--batch_size", "4",
                "--encoding_size", "64",
                "--split_dir", str(split_dir),
            ]
        )
        assert len(df) == 1
        assert df["cls_test_auc"].iloc[0] > 0.6

        results_dir = root / "results" / "smoke_s1"
        assert (results_dir / "experiment_smoke.txt").exists()
        assert (results_dir / "s_0_checkpoint").exists()
        assert (results_dir / "split_0_results.pkl").exists()
        assert (results_dir / "summary_partial_0_1.csv").exists()

        edf = evaluate.main(
            [
                "--task", task_json,
                "--data_root_dir", str(root / "bags"),
                "--results_dir", str(root / "results"),
                "--models_exp_code", "smoke_s1",
                "--save_exp_code", "smoke_eval",
                "--k", "2",
                "--k_end", "1",
                "--batch_size", "4",
                "--encoding_size", "64",
                "--bootstrap", "50",
                "--calibrate",
                "--buckets", "auto",  # data-derived ladder: results must be identical (padding is exact)
            ]
        )
        assert len(edf) == 1
        fold_csv = root / "eval_results" / "EVAL_smoke_eval" / "fold_0.csv"
        assert fold_csv.exists()
        import json as _json

        cis = _json.loads((root / "eval_results" / "EVAL_smoke_eval" / "fold_0_ci.json").read_text())
        assert set(cis) == {"cls_auc", "cls_acc", "cls_top3_acc", "site_auc"}
        ci = cis["cls_auc"]
        assert ci["lo"] <= edf["cls_test_auc"].iloc[0] <= ci["hi"]
        assert ci["n_valid"] == ci["n_boot"] == 50
        # CIs land in the summary row, and the confusion matrix is written
        assert edf["cls_auc_ci_lo"].iloc[0] == ci["lo"]
        cm = pd.read_csv(root / "eval_results" / "EVAL_smoke_eval" / "fold_0_confusion.csv", index_col=0)
        assert cm.shape == (18, 18) and "Esophagogastric" in cm.index
        fdf0 = pd.read_csv(fold_csv)
        assert int(cm.to_numpy().sum()) == len(fdf0)
        assert int(np.diag(cm.to_numpy()).sum()) == int((fdf0["Y"] == fdf0["Y_hat"]).sum())
        cal = _json.loads((root / "eval_results" / "EVAL_smoke_eval" / "fold_0_calibration.json").read_text())
        # T minimizes val NLL (ECE usually improves too, but isn't the objective)
        assert cal["temperature"] > 0 and cal["val_ece_after"] <= cal["val_ece_before"] + 0.05
        assert {"ece_before", "ece_after", "nll_before", "nll_after"} <= set(cal)
        fdf = pd.read_csv(fold_csv)
        assert list(fdf.columns[:6]) == ["slide_id", "sex", "Y", "Y_hat", "site", "site_hat"]
        assert "p_17" in fdf.columns and "site_p" in fdf.columns
        # eval on the same split/checkpoint reproduces the training-side AUC
        np.testing.assert_allclose(edf["cls_test_auc"].iloc[0], df["cls_test_auc"].iloc[0], atol=2e-3)

        # --int8 end-to-end through the CLI (engine builds the quantized step
        # from the restored params; guards the step's params-identity contract)
        qdf = evaluate.main(
            [
                "--task", task_json,
                "--data_root_dir", str(root / "bags"),
                "--results_dir", str(root / "results"),
                "--models_exp_code", "smoke_s1",
                "--save_exp_code", "smoke_eval_int8",
                "--k", "2",
                "--k_end", "1",
                "--batch_size", "4",
                "--encoding_size", "64",
                "--int8",
            ]
        )
        np.testing.assert_allclose(qdf["cls_test_auc"].iloc[0], edf["cls_test_auc"].iloc[0], atol=0.03)
    finally:
        os.chdir(cwd)


def test_evaluate_split_all(cli_env):
    from toad_tpu.cli import evaluate

    root = cli_env
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        edf = evaluate.main(
            [
                "--task", task_json,
                "--data_root_dir", str(root / "bags"),
                "--results_dir", str(root / "results"),
                "--models_exp_code", "smoke_s1",
                "--save_exp_code", "smoke_eval_all",
                "--split", "all",
                "--k", "2",
                "--k_end", "1",
                "--batch_size", "4",
                "--encoding_size", "64",
                "--calibrate",
            ]
        )
        assert len(edf) == 1
        fdf = pd.read_csv(root / "eval_results" / "EVAL_smoke_eval_all" / "fold_0.csv")
        manifest = pd.read_csv(root / "dataset_csv" / "dummy_dataset.csv")
        assert len(fdf) == len(manifest)
        # 'all' contains the calibration (val) slides: flagged, not silent
        import json as _json

        cal = _json.loads(
            (root / "eval_results" / "EVAL_smoke_eval_all" / "fold_0_calibration.json").read_text()
        )
        assert "partially self-calibrated" in cal.get("note", "")
    finally:
        os.chdir(cwd)


def test_train_fold_devices_cli(cli_env, tmp_path):
    """--fold_devices 2 trains both folds concurrently (one per CPU device)
    and writes the same artifacts/summary schema as the sequential driver."""
    from toad_tpu.cli import create_splits, train

    root = cli_env
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        split_dir = create_splits.main(
            ["--task", task_json, "--k", "2", "--seed", "7", "--val_frac", "0.15", "--test_frac", "0.2",
             "--split_code", "pf"]
        )
        df = train.main(
            [
                "--task", task_json,
                "--data_root_dir", str(root / "bags"),
                "--exp_code", "pfsmoke",
                "--k", "2",
                "--max_epochs", "2",
                "--batch_size", "4",
                "--encoding_size", "64",
                "--split_dir", str(split_dir),
                "--results_dir", str(tmp_path),
                "--fold_devices", "2",
            ]
        )
        assert len(df) == 2 and list(df["folds"]) == [0, 1]
        results_dir = tmp_path / "pfsmoke_s1"
        for i in range(2):
            assert (results_dir / f"s_{i}_checkpoint").exists()
            assert (results_dir / f"split_{i}_results.pkl").exists()
        assert (results_dir / "summary.csv").exists()
    finally:
        os.chdir(cwd)


def test_train_fold_devices_refuses_mesh(cli_env):
    """Flag-combination errors fire before any dataset/backend work."""
    from toad_tpu.cli import train

    root = cli_env
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    base = ["--task", task_json, "--exp_code", "pfbad", "--fold_devices", "2"]
    with pytest.raises(ValueError, match="data_shards"):
        train.main(base + ["--data_shards", "2"])
    with pytest.raises(ValueError, match="profile"):
        train.main(base + ["--profile", "/tmp/nope"])


def test_train_missing_splits_errors(cli_env):
    from toad_tpu.cli import train

    root = cli_env
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        with pytest.raises(FileNotFoundError, match="split dir"):
            train.main(
                [
                    "--task", task_json,
                    "--data_root_dir", str(root / "bags"),
                    "--exp_code", "x",
                    "--split_dir", "does_not_exist",
                ]
            )
    finally:
        os.chdir(cwd)


def test_train_missing_data_root_fails_fast(cli_env):
    """Omitting --data_root_dir must die at startup with an actionable
    message, not a ValueError from a prefetch worker at first bag access."""
    from toad_tpu.cli import evaluate, train

    root = cli_env
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    with pytest.raises(SystemExit, match="data_root_dir is required"):
        train.main(["--task", task_json, "--exp_code", "x"])
    with pytest.raises(SystemExit, match="is not a directory"):
        train.main(["--task", task_json, "--exp_code", "x", "--data_root_dir", str(root / "nope")])
    with pytest.raises(SystemExit, match="data_root_dir is required"):
        evaluate.main(["--task", task_json, "--models_exp_code", "x"])


def test_validate_cli(cli_env, tmp_path, capsys):
    """validate: clean store passes (rc 0) with sane stats + ladder; a
    missing bag and a dim-mismatched bag flip it to rc 1 with both listed."""
    import json as _json
    import shutil

    from toad_tpu.cli import validate

    root = cli_env
    # work on a copy so the shared fixture stays intact
    bags = tmp_path / "bags"
    shutil.copytree(root / "bags", bags)
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    argv = ["--task", task_json, "--data_root_dir", str(bags), "--encoding_size", "64"]

    assert validate.main(argv) == 0
    rep = _json.loads(capsys.readouterr().out)
    assert rep["n_missing"] == 0 and rep["n_dim_mismatch"] == 0
    assert rep["patch_counts"]["min"] >= 32 and rep["patch_counts"]["max"] <= 128
    assert all(b % 128 == 0 for b in rep["bucket_ladder_suggested"])
    assert rep["padding_overhead_suggested"] <= rep["padding_overhead_default"] + 1e-9

    victims = sorted(bags.glob("*.npy"))[:2]
    victims[0].unlink()  # missing bag
    np.save(victims[1], np.zeros((40, 32), np.float32))  # wrong dim
    assert validate.main(argv) == 1
    rep = _json.loads(capsys.readouterr().out)
    assert rep["n_missing"] == 1 and rep["n_dim_mismatch"] == 1
    assert victims[1].name in rep["dim_mismatch"][0]


def test_validate_bag_shape_npz_header_only(tmp_path, monkeypatch):
    """bag_shape on .npz (f32 and int8 stores) reads zip member *headers*
    only — the metadata-only contract; a full np.load would do O(store size)
    IO during pre-flight."""
    from toad_tpu.cli.validate import bag_shape
    from toad_tpu.data.bags import save_int8_bag

    f32 = tmp_path / "a.npz"
    np.savez(f32, features=np.zeros((7, 64), np.float32))
    q = tmp_path / "b.npz"
    save_int8_bag(q, np.random.RandomState(0).randn(9, 64).astype(np.float32))

    def _no_full_load(*a, **k):
        raise AssertionError("bag_shape must not np.load() an .npz payload")

    monkeypatch.setattr(np, "load", _no_full_load)
    assert tuple(bag_shape(f32)) == (7, 64)
    assert tuple(bag_shape(q)) == (9, 64)


def test_unified_dispatcher(capsys):
    """python -m toad_tpu <command> routes to the per-command mains."""
    from toad_tpu.__main__ import COMMANDS, main

    assert main([]) == 0
    assert "create-splits" in capsys.readouterr().out
    assert main(["not-a-command"]) == 2
    assert "unknown command" in capsys.readouterr().err
    # every advertised command resolves to a module with main(argv)
    import importlib

    for name, (mod, _) in COMMANDS.items():
        m = importlib.import_module(mod)
        assert callable(m.main), name
    # and a real command actually runs through the dispatcher
    with pytest.raises(SystemExit):  # argparse --help exits 0
        main(["train", "--help"])


def test_enable_compile_cache_populates_dir(tmp_path):
    """--compile_cache wiring: compiled programs persist to the given dir.
    Runs in-process (a subprocess JAX re-init can hang for minutes against
    the contended TPU tunnel even with JAX_PLATFORMS=cpu — plugin discovery
    imports dial out); the global cache config is restored afterwards."""
    import jax
    from jax._src import compilation_cache

    from toad_tpu.cli.common import enable_compile_cache

    cache = tmp_path / "xla_cache"
    prev = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )
    try:
        enable_compile_cache(cache, min_compile_secs=0.0)
        # odd unique shape: can't be an earlier test's in-memory cache hit
        x = jax.numpy.ones((253, 253))
        jax.jit(lambda v: v @ v + 1.0)(x).block_until_ready()
        assert len(list(cache.iterdir())) >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", prev[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev[1])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev[2])
        compilation_cache.reset_cache()


def test_report_cli(tmp_path, capsys):
    """report: aggregates summary.csv across folds (mean/std/min/max) and
    folds in calibration temperatures when present."""
    import json as _json

    import pandas as pd

    d = tmp_path / "EVAL_x"
    d.mkdir()
    pd.DataFrame({
        "folds": [0, 1, 2],
        "cls_test_auc": [0.8, 0.9, 0.7],
        "cls_test_acc": [0.6, 0.7, float("nan")],  # nan folds excluded per-metric
    }).to_csv(d / "summary.csv")
    (d / "fold_0_calibration.json").write_text(_json.dumps({"temperature": 1.5}))
    (d / "fold_1_calibration.json").write_text(_json.dumps({"temperature": 2.5}))

    from toad_tpu.cli import report

    out_csv = tmp_path / "agg.csv"
    assert report.main(["--dir", str(d), "--out", str(out_csv)]) == 0
    out = capsys.readouterr().out
    flat = _json.loads(out.strip().splitlines()[-1])
    np.testing.assert_allclose(flat["cls_test_auc_mean"], 0.8)
    np.testing.assert_allclose(flat["cls_test_acc_mean"], 0.65)
    np.testing.assert_allclose(flat["calibration_temperature_mean"], 2.0)
    agg = pd.read_csv(out_csv)
    row = agg[agg.metric == "cls_test_auc"].iloc[0]
    np.testing.assert_allclose([row["min"], row["max"], row["n"]], [0.7, 0.9, 3])
    np.testing.assert_allclose(row["std"], 0.1, rtol=1e-12)


def test_convert_cli(tmp_path, capsys):
    """convert re-encodes a store (f32 .pt -> int8 .npz here): outputs are
    exact save_int8_bag twins of the sources, coords carry over, skip_done
    skips, and in-place / empty-dir / bad-dir calls fail loudly."""
    from toad_tpu.cli import convert
    from toad_tpu.data.bags import load_bag, load_bag_quantized
    from toad_tpu.data.torch_io import save_torch_pickle
    from toad_tpu.ops.quantize import quantize_rows_np

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    rng = np.random.RandomState(3)
    bags = {}
    for i in range(3):
        bags[f"s{i}"] = rng.randn(20 + i, 16).astype(np.float32)
        save_torch_pickle(src / f"s{i}.pt", bags[f"s{i}"])
    # one .h5 with coords: conversion must carry them into the npz
    import h5py

    coords = rng.randint(0, 999, (11, 2)).astype(np.int64)
    with h5py.File(src / "withc.h5", "w") as f:
        f.create_dataset("features", data=rng.randn(11, 16).astype(np.float32))
        f.create_dataset("coords", data=coords)
    # a featurize-layout coords SIDECAR is metadata, not a bag: must be
    # skipped, not quantized into a junk s9.coords.npz
    np.save(src / "s9.npy", rng.randn(7, 16).astype(np.float32))
    np.save(src / "s9.coords.npy", rng.randint(0, 99, (7, 2)).astype(np.int64))
    bags["s9"] = np.load(src / "s9.npy")

    convert.main(["--data_dir", str(src), "--out_dir", str(dst)])
    out = capsys.readouterr().out
    assert "converted 5 bags" in out and "smaller" in out
    assert not (dst / "s9.coords.npz").exists()  # sidecar skipped, not converted
    # the s9 sidecar's coords reach the npz through load_bag(with_coords=True)
    from toad_tpu.data.bags import load_bag as _lb

    _, s9c = _lb(dst / "s9.npz", with_coords=True)
    np.testing.assert_array_equal(s9c, np.load(src / "s9.coords.npy"))
    for name, feats in bags.items():
        xq, s, c = load_bag_quantized(dst / f"{name}.npz")
        q_ref, s_ref = quantize_rows_np(feats)
        np.testing.assert_array_equal(xq, q_ref)
        np.testing.assert_array_equal(s, s_ref)
        assert c is None or name == "s9"  # s9's sidecar coords carry over
    _, c = load_bag(dst / "withc.npz", with_coords=True)
    np.testing.assert_array_equal(c, coords)

    # skip_done: nothing rewritten
    convert.main(["--data_dir", str(src), "--out_dir", str(dst), "--skip_done"])
    assert "converted 0 bags" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="not in-place"):
        convert.main(["--data_dir", str(src), "--out_dir", str(src)])
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no bag files"):
        convert.main(["--data_dir", str(empty), "--out_dir", str(dst)])
    with pytest.raises(SystemExit, match="not a directory"):
        convert.main(["--data_dir", str(tmp_path / "nope"), "--out_dir", str(dst)])

    # round-trip the other way: int8 store -> f32 .npy (transparent dequant);
    # the size message must report growth, not "0.2x smaller"
    back = tmp_path / "back"
    convert.main(["--data_dir", str(dst), "--out_dir", str(back), "--format", "npy"])
    assert "larger" in capsys.readouterr().out
    xq, s, _ = load_bag_quantized(dst / "s0.npz")
    np.testing.assert_allclose(
        np.load(back / "s0.npy"), xq.astype(np.float32) * s[:, None], rtol=0, atol=0
    )

    # two sources sharing a stem would silently clobber one output: loud error
    np.save(src / "dup.npy", bags["s0"])
    (src / "dup.npz").write_bytes((dst / "s0.npz").read_bytes())
    with pytest.raises(SystemExit, match="duplicate bag stem"):
        convert.main(["--data_dir", str(src), "--out_dir", str(tmp_path / "d2")])
