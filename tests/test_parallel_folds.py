"""Fold-parallel CV training (train/parallel_folds.py): one fold per device.

The contract is *placement only*: every fold's computation is the unchanged
sequential FoldTrainer math committed to its own device, so per-fold results
must be bit-identical to a sequential run (same PRNGKey(seed) per fold —
reference re-seeds per fold, main_mtl_concat.py:48 — and same private
batcher RNG). Verified here on the 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from toad_tpu.data.splits import generate_splits
from toad_tpu.data.wsi_dataset import WSIBagDataset
from toad_tpu.train.loop import FoldTrainer
from toad_tpu.train.parallel_folds import resolve_fold_devices, train_folds_parallel


def _cfg(dim: int, max_epochs: int = 2, **kw) -> TrainConfig:
    return TrainConfig(
        max_epochs=max_epochs,
        seed=1,
        model=ModelConfig(in_dim=dim, n_classes=18),
        optim=OptimConfig(lr=3e-4),
        data=DataConfig(batch_size=4, bucket_sizes=(64, 128, 256)),
        **kw,
    )


@pytest.fixture(scope="module")
def fold_jobs(dummy_env):
    """Three folds' (train, val, test) splits off the shared dummy dataset."""
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    counts = np.bincount(ds.labels, minlength=ds.num_classes[0])
    jobs = []
    for fold, spec in enumerate(
        generate_splits(
            ds.slide_cls_ids,
            val_num=np.maximum((counts * 0.15).astype(int), 1),
            test_num=np.maximum((counts * 0.2).astype(int), 1),
            samples=ds.n_slides,
            n_splits=3,
            seed=1,
        )
    ):
        jobs.append((fold, (ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test))))
    return jobs


def test_parallel_matches_sequential_bitwise(fold_jobs, tmp_path):
    cfg = _cfg(64)
    seq = {}
    for fold, splits in fold_jobs[:2]:
        trainer = FoldTrainer(cfg, fold=fold, results_dir=tmp_path / "seq", writer=None)
        seq[fold] = trainer.train(*splits, log_fn=lambda s: None)

    par = train_folds_parallel(
        cfg, fold_jobs[:2], tmp_path / "par", n_devices=2, log_fn=lambda s: None
    )

    assert sorted(par) == [0, 1]
    for fold in (0, 1):
        a, b = seq[fold], par[fold]
        # scalar metrics identical to the last bit
        for key in ("cls_test_auc", "cls_val_auc", "cls_test_acc", "site_test_auc"):
            assert a[key] == b[key], (fold, key, a[key], b[key])
        # final params bit-identical leaf by leaf
        la = jax_leaves(a["params"])
        lb = jax_leaves(b["params"])
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_more_folds_than_devices(fold_jobs, tmp_path):
    """3 folds on 2 devices: the work queue drains without a round barrier."""
    cfg = _cfg(64, max_epochs=1)
    par = train_folds_parallel(cfg, fold_jobs, tmp_path, n_devices=2, log_fn=lambda s: None)
    assert sorted(par) == [0, 1, 2]
    for r in par.values():
        assert np.isfinite(r["cls_test_auc"])


def test_params_land_on_distinct_devices(fold_jobs, tmp_path):
    import jax

    cfg = _cfg(64, max_epochs=1)
    par = train_folds_parallel(cfg, fold_jobs[:2], tmp_path, n_devices=2, log_fn=lambda s: None)
    devs = {next(iter(jax.tree.leaves(par[f]["params"])[0].devices())) for f in par}
    assert len(devs) == 2, devs


def test_refuses_mesh_combination(fold_jobs, tmp_path):
    cfg = _cfg(64, data_shards=2)
    with pytest.raises(ValueError, match="data_shards"):
        train_folds_parallel(cfg, fold_jobs[:1], tmp_path, n_devices=2)


def test_refuses_profile(fold_jobs, tmp_path):
    cfg = _cfg(64, profile_dir=str(tmp_path / "trace"))
    with pytest.raises(ValueError, match="profile"):
        train_folds_parallel(cfg, fold_jobs[:1], tmp_path, n_devices=2)


def test_resolve_fold_devices_bounds():
    import jax

    assert resolve_fold_devices(-1) == jax.local_devices()
    assert len(resolve_fold_devices(2)) == 2
    with pytest.raises(ValueError, match="only"):
        resolve_fold_devices(10_000)
    with pytest.raises(ValueError, match=">= 1"):
        resolve_fold_devices(0)


def test_resume_after_crash_under_device(fold_jobs, tmp_path):
    """The device-pinned resume path (restore → device_put of the whole state)
    continues bit-identically after a crash, like the sequential trainer."""
    import jax

    class Boom(Exception):
        pass

    fold, splits = fold_jobs[0]
    cfg = _cfg(64, max_epochs=3, resume=True)
    dev = jax.local_devices()[1]

    straight = FoldTrainer(cfg, fold=fold, results_dir=tmp_path / "a", device=dev).train(
        *splits, log_fn=lambda s: None
    )

    def crashing_log(s):
        if "epoch 1: train" in s:
            raise Boom()

    trainer_b = FoldTrainer(cfg, fold=fold, results_dir=tmp_path / "b", device=dev)
    with pytest.raises(Boom):
        trainer_b.train(*splits, log_fn=crashing_log)
    assert trainer_b.resume_path.exists()

    logs = []
    resumed = FoldTrainer(cfg, fold=fold, results_dir=tmp_path / "b", device=dev).train(
        *splits, log_fn=logs.append
    )
    assert any("resumed from epoch 0" in line for line in logs)
    for a, b in zip(jax.tree.leaves(straight["params"]), jax.tree.leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the resumed state actually lives on the pinned device
    assert next(iter(jax.tree.leaves(resumed["params"])[0].devices())) == dev


def test_cli_resume_composes_with_fold_devices(dummy_env, tmp_path, monkeypatch, capsys):
    """`train --resume --fold_devices 2` survives a mid-experiment preemption:
    folds completed before the crash persisted their summaries immediately
    (on_result fires per fold, not after the whole fan-out), the restart skips
    them, resumes the interrupted fold from its epoch snapshot, and the final
    summary is bit-identical to an uninterrupted run."""
    import toad_tpu.train.parallel_folds as pf
    from toad_tpu.cli import create_splits, train as train_cli

    task_json = dummy_env["root"] / "task_pfresume.json"
    task_json.write_text(dummy_env["task"].to_json())
    monkeypatch.chdir(tmp_path)
    create_splits.main(["--task", str(task_json), "--k", "2", "--seed", "1",
                        "--val_frac", "0.15", "--test_frac", "0.2"])
    split_dir = str(tmp_path / "splits" / f"{dummy_env['task'].name}_100")

    def cli_args(results_dir):
        return ["--task", str(task_json), "--data_root_dir", str(dummy_env["data_dir"]),
                "--exp_code", "pfres", "--k", "2", "--max_epochs", "2",
                "--encoding_size", str(dummy_env["dim"]), "--batch_size", "4",
                "--split_dir", split_dir, "--results_dir", results_dir,
                "--resume", "--fold_devices", "2"]

    df_a = train_cli.main(cli_args(str(tmp_path / "ra")))

    # preemption analog: fold 1 dies the moment its epoch-1 train line logs
    # (fold 0 runs to completion on its own device before the error surfaces)
    class Boom(Exception):
        pass

    real_trainer = pf.FoldTrainer

    class CrashyTrainer(real_trainer):
        def train(self, *splits, log_fn=print):
            if self.fold == 1:
                inner = log_fn

                def log_fn(s):
                    inner(s)
                    if "epoch 1: train" in s:
                        raise Boom()

            return super().train(*splits, log_fn=log_fn)

    monkeypatch.setattr(pf, "FoldTrainer", CrashyTrainer)
    with pytest.raises(RuntimeError, match="fold 1 failed"):
        train_cli.main(cli_args(str(tmp_path / "rb")))
    monkeypatch.setattr(pf, "FoldTrainer", real_trainer)

    rb = tmp_path / "rb" / "pfres_s1"
    assert (rb / "fold_0_summary.json").exists()  # persisted despite the crash
    assert not (rb / "fold_1_summary.json").exists()
    assert (rb / "s_1_resume").exists()  # epoch-0 snapshot to resume from

    capsys.readouterr()
    df_b = train_cli.main(cli_args(str(tmp_path / "rb")))
    out = capsys.readouterr().out
    assert out.count("already complete") == 1  # fold 0 skipped, not retrained
    assert "[fold 1] resumed from epoch 0" in out
    for col in ("cls_test_auc", "cls_val_auc", "site_test_auc", "cls_test_acc"):
        assert df_b[col].tolist() == df_a[col].tolist(), col


def test_cli_evaluate_fold_devices_matches_sequential(tmp_path, monkeypatch):
    """`evaluate --fold_devices 2` is placement-only, like train: fold CSVs,
    the ensemble CSV, and the summary are identical to the sequential run."""
    import jax
    import pandas as pd

    from toad_tpu.cli import evaluate, make_dummy
    from toad_tpu.config import ModelConfig
    from toad_tpu.models.toad_mil import ToadMIL
    from toad_tpu.train.checkpoint import save_checkpoint

    root = tmp_path / "env"
    make_dummy.main(["--out_dir", str(root), "--n_patients", "24",
                     "--max_slides_per_patient", "1", "--min_patches", "32",
                     "--max_patches", "96", "--dim", "64", "--seed", "5"])
    task_json = str(root / "tasks" / "dummy_mtl_concat.json")
    models_dir = tmp_path / "results" / "pfe_s1"
    models_dir.mkdir(parents=True)
    model = ToadMIL(ModelConfig(in_dim=64, n_classes=18))
    for i in (0, 1):
        save_checkpoint(models_dir / f"s_{i}_checkpoint",
                        {"params": model.init(jax.random.PRNGKey(i)), "epoch": np.int64(0)})

    monkeypatch.chdir(tmp_path)
    base = ["--task", task_json, "--data_root_dir", str(root / "bags"),
            "--results_dir", str(tmp_path / "results"), "--models_exp_code", "pfe_s1",
            "--k", "2", "--split", "all", "--encoding_size", "64", "--batch_size", "4",
            "--buckets", "128,256", "--ensemble"]
    df_seq = evaluate.main(base + ["--save_exp_code", "seq"])
    df_par = evaluate.main(base + ["--save_exp_code", "par", "--fold_devices", "2"])

    for col in df_seq.columns:
        assert df_seq[col].tolist() == df_par[col].tolist(), col
    for name in ("fold_0.csv", "fold_1.csv", "ensemble.csv"):
        a = pd.read_csv(tmp_path / "eval_results" / "EVAL_seq" / name)
        b = pd.read_csv(tmp_path / "eval_results" / "EVAL_par" / name)
        pd.testing.assert_frame_equal(a, b)


def test_worker_error_propagates(fold_jobs, tmp_path):
    """A fold raising mid-train surfaces as RuntimeError naming the fold."""
    cfg = _cfg(64, max_epochs=1)
    fold, (tr, va, te) = fold_jobs[0]

    class Broken:
        # quacks enough to get past split bookkeeping, then fails in the batcher
        slide_ids = tr.slide_ids

        def __len__(self):
            return len(tr)

        def __getattr__(self, name):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="fold 0 failed"):
        train_folds_parallel(cfg, [(0, (Broken(), va, te))], tmp_path, n_devices=1)
