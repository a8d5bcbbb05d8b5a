"""Preemption-tolerant resume: full training state (params + optimizer + RNG +
early-stop state) snapshots every epoch and continues identically after a
crash — a capability the reference lacks entirely (SURVEY §5)."""

import numpy as np
import pytest

import jax

from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from toad_tpu.data.splits import generate_splits
from toad_tpu.data.wsi_dataset import WSIBagDataset
from toad_tpu.train.loop import FoldTrainer


class Boom(Exception):
    pass


def _splits(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
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
    return ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test)


def _cfg(dummy_env, **kw):
    return TrainConfig(
        max_epochs=3,
        seed=1,
        resume=True,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        optim=OptimConfig(lr=3e-4),
        data=DataConfig(batch_size=4, bucket_sizes=(64, 128, 256)),
        **kw,
    )


def test_resume_after_crash_matches_uninterrupted(dummy_env, tmp_path):
    splits = _splits(dummy_env)
    cfg = _cfg(dummy_env)

    # straight-through run
    straight = FoldTrainer(cfg, fold=0, results_dir=tmp_path / "a").train(
        *splits, log_fn=lambda s: None
    )

    # crash mid-run: raise the moment epoch 1's train line is logged
    seen = []

    def crashing_log(s):
        if "epoch 1: train" in s:
            raise Boom()
        seen.append(s)

    trainer_b = FoldTrainer(cfg, fold=0, results_dir=tmp_path / "b")
    with pytest.raises(Boom):
        trainer_b.train(*splits, log_fn=crashing_log)
    assert trainer_b.resume_path.exists()  # epoch-0 snapshot persisted

    # fresh trainer object (new process analog) resumes and finishes
    logs = []
    trainer_c = FoldTrainer(cfg, fold=0, results_dir=tmp_path / "b")
    resumed = trainer_c.train(*splits, log_fn=logs.append)
    assert any("resumed from epoch 0" in line for line in logs)
    assert not trainer_c.resume_path.exists()  # cleaned up on completion

    # identical final state: same RNG stream, same per-epoch batch order
    for a, b in zip(jax.tree.leaves(straight["params"]), jax.tree.leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert resumed["cls_test_auc"] == straight["cls_test_auc"]


def test_resume_with_early_stopping_state(dummy_env, tmp_path):
    """Stopper best/counter survive the snapshot round-trip."""
    from toad_tpu.train.loop import EarlyStopping

    s = EarlyStopping(patience=3, stop_epoch=0)
    s(0, 1.0)
    s(1, 2.0)  # no improvement -> counter 1
    d = s.state_dict()
    s2 = EarlyStopping(patience=3, stop_epoch=0)
    s2.load_state_dict(d)
    assert s2.best == 1.0 and s2.counter == 1 and not s2.early_stop

    # fresh stopper round-trips the "no best yet" state
    empty = EarlyStopping()
    e2 = EarlyStopping()
    e2.load_state_dict(empty.state_dict())
    assert e2.best is None and e2.counter == 0


def test_no_resume_flag_means_no_snapshot(dummy_env, tmp_path):
    splits = _splits(dummy_env)
    cfg = _cfg(dummy_env)
    cfg = TrainConfig(**{**cfg.__dict__, "resume": False, "max_epochs": 1})
    trainer = FoldTrainer(cfg, fold=0, results_dir=tmp_path / "c")
    trainer.train(*splits, log_fn=lambda s: None)
    assert not trainer.resume_path.exists()


def test_profile_dir_writes_trace(dummy_env, tmp_path):
    """--profile captures a jax.profiler trace of the first train steps."""
    splits = _splits(dummy_env)
    base = _cfg(dummy_env)
    cfg = TrainConfig(**{**base.__dict__, "resume": False, "max_epochs": 1,
                         "profile_dir": str(tmp_path / "trace")})
    FoldTrainer(cfg, fold=0, results_dir=tmp_path / "r").train(*splits, log_fn=lambda s: None)
    produced = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_snapshot_swap_preserves_previous_on_failed_save(tmp_path, monkeypatch):
    """save_checkpoint writes to a temp dir and swaps, so the previous
    snapshot survives a crash mid-write."""
    import orbax.checkpoint as ocp

    from toad_tpu.train import checkpoint as ckpt

    state1 = {"params": {"w": np.ones((2, 2), np.float32)}}
    path = tmp_path / "snap"
    ckpt.save_checkpoint(path, state1)

    real_save = ocp.StandardCheckpointer.save

    def boom(self, *a, **k):
        raise RuntimeError("simulated preemption mid-write")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        ckpt.save_checkpoint(path, {"params": {"w": np.zeros((2, 2), np.float32)}})
    monkeypatch.setattr(ocp.StandardCheckpointer, "save", real_save)

    back = ckpt.restore_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], state1["params"]["w"])


def test_save_purges_stale_orbax_internal_tmp(tmp_path):
    """A kill mid-save leaves Orbax's OWN unfinalized `<target>.orbax-
    checkpoint-tmp` dir beside ours; letting orbax discover it races its
    async commit thread (observed ENOENT on the ocdbt lock rename). The next
    save_checkpoint must purge it up front and succeed."""
    from toad_tpu.train import checkpoint as ckpt

    path = tmp_path / "snap"
    state = {"params": {"w": np.ones((2, 2), np.float32)}}
    for stale_name in (".tmp_snap.orbax-checkpoint-tmp", "snap.orbax-checkpoint-tmp"):
        stale = tmp_path / stale_name
        (stale / "d").mkdir(parents=True)
        (stale / "d" / "junk.__lock").write_bytes(b"leftover from a killed save")

    ckpt.save_checkpoint(path, state)

    assert not list(tmp_path.glob("*orbax-checkpoint-tmp*"))
    back = ckpt.restore_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])


def test_cli_skips_completed_folds(dummy_env, tmp_path, monkeypatch, capsys):
    """k-fold driver with --resume does not retrain folds that already
    finished before a preemption."""
    import json
    import os

    from toad_tpu.cli import create_splits, train as train_cli

    root = dummy_env["root"]
    task_json = root / "task_resume.json"
    task_json.write_text(dummy_env["task"].to_json())
    monkeypatch.chdir(tmp_path)
    create_splits.main(["--task", str(task_json), "--k", "2", "--seed", "1",
                        "--val_frac", "0.15", "--test_frac", "0.2"])
    args = ["--task", str(task_json), "--data_root_dir", str(dummy_env["data_dir"]),
            "--exp_code", "resumetest", "--k", "2", "--max_epochs", "1",
            "--encoding_size", str(dummy_env["dim"]), "--batch_size", "4",
            "--split_dir", str(tmp_path / "splits" / f"{dummy_env['task'].name}_100"),
            "--results_dir", str(tmp_path / "results"), "--resume"]
    df1 = train_cli.main(args)
    capsys.readouterr()
    # second invocation (post-preemption restart analog): both folds skip
    df2 = train_cli.main(args)
    out = capsys.readouterr().out
    assert out.count("already complete") == 2
    assert df2["cls_test_auc"].tolist() == df1["cls_test_auc"].tolist()


def test_early_stopping_checkpoint_roundtrip(dummy_env, tmp_path):
    """Early stopping saves best-val checkpoints mid-training and reloads
    them at the end (reference core_utils:148-151) — this exercises the
    orbax save/restore of mixed params+scalar state that plain runs skip."""
    splits = _splits(dummy_env)
    cfg = TrainConfig(
        max_epochs=3,
        seed=1,
        early_stopping=True,
        min_stop_epoch=0,
        patience=2,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        optim=OptimConfig(lr=3e-4),
        data=DataConfig(batch_size=4, bucket_sizes=(64, 128, 256)),
    )
    trainer = FoldTrainer(cfg, fold=0, results_dir=tmp_path)
    r = trainer.train(*splits, log_fn=lambda s: None)
    assert trainer.ckpt_path.exists()
    assert np.isfinite(r["cls_test_auc"])
    from toad_tpu.train.checkpoint import restore_checkpoint

    state = restore_checkpoint(trainer.ckpt_path)
    assert "params" in state and "epoch" in state


# ---- RSS-watermark restart (leaky transfer-client containment, r5) ---------


def test_rss_watermark_snapshots_and_raises(dummy_env, tmp_path, monkeypatch):
    """Crossing rss_restart_gb at an epoch boundary saves a resume snapshot
    and raises HostRssWatermark; a fresh trainer then RESUMES (does not start
    over) and finishes with the same result as an uninterrupted run."""
    from toad_tpu.train import loop as loop_mod
    from toad_tpu.train.loop import HostRssWatermark

    splits = _splits(dummy_env)
    straight = FoldTrainer(_cfg(dummy_env), fold=0, results_dir=tmp_path / "a").train(
        *splits, log_fn=lambda s: None
    )

    cfg = _cfg(dummy_env, rss_restart_gb=1e-6)  # any real RSS trips it
    trainer = FoldTrainer(cfg, fold=0, results_dir=tmp_path / "b")
    with pytest.raises(HostRssWatermark) as ei:
        trainer.train(*splits, log_fn=lambda s: None)
    assert ei.value.epoch == 0 and ei.value.rss_gb > 0
    assert trainer.resume_path.exists()  # snapshot saved BEFORE raising

    # "re-exec": a fresh process is modeled by a fresh trainer; lift the limit
    # (the leak is process-level state, gone after exec)
    cfg2 = _cfg(dummy_env)
    resumed = FoldTrainer(cfg2, fold=0, results_dir=tmp_path / "b").train(
        *splits, log_fn=lambda s: None
    )
    np.testing.assert_allclose(resumed["cls_test_auc"], straight["cls_test_auc"], atol=1e-6)
    np.testing.assert_allclose(resumed["cls_val_auc"], straight["cls_val_auc"], atol=1e-6)


def test_rss_watermark_requires_resume(dummy_env, tmp_path):
    cfg = _cfg(dummy_env, rss_restart_gb=1.0)
    cfg = TrainConfig(**{**cfg.__dict__, "resume": False})
    with pytest.raises(ValueError, match="requires resume"):
        FoldTrainer(cfg, fold=0, results_dir=tmp_path).train(
            *_splits(dummy_env), log_fn=lambda s: None
        )


def test_cli_rss_watermark_reexecs_with_same_args(dummy_env, tmp_path, monkeypatch, capsys):
    """The train CLI catches HostRssWatermark and re-execs itself with the
    SAME argv; a real exec would resume (fold summaries + snapshots persist)."""
    from toad_tpu.cli import create_splits, train as train_cli

    root = dummy_env["root"]
    task_json = root / "task_rss.json"
    task_json.write_text(dummy_env["task"].to_json())
    monkeypatch.chdir(tmp_path)
    create_splits.main(["--task", str(task_json), "--k", "2", "--seed", "1",
                        "--val_frac", "0.15", "--test_frac", "0.2"])
    args = ["--task", str(task_json), "--data_root_dir", str(dummy_env["data_dir"]),
            "--exp_code", "rsstest", "--k", "2", "--k_end", "1", "--max_epochs", "1",
            "--encoding_size", str(dummy_env["dim"]), "--batch_size", "4",
            "--split_dir", str(tmp_path / "splits" / f"{dummy_env['task'].name}_100"),
            "--results_dir", str(tmp_path / "results"), "--resume",
            "--rss_restart_gb", "0.000001"]
    execs = []
    monkeypatch.setattr(train_cli, "_reexec", lambda argv: execs.append(argv))
    out_df = train_cli.main(args)
    assert out_df is None  # watermark path returns after (stubbed) exec
    assert execs == [args]
    # the snapshot the watermark saved is on disk for the re-exec'd process
    assert (tmp_path / "results" / "rsstest_s1" / "s_0_resume").exists()

    # without --resume the flag refuses before any training
    with pytest.raises(SystemExit, match="requires --resume"):
        train_cli.main([a for a in args if a != "--resume"])


def test_serve_cli_rejects_then_accepts_max_rss_gb():
    """--max_rss_gb parses; RESTART_EXIT_CODE is a distinct supervisor
    contract (not 0/1)."""
    from toad_tpu.cli import serve as serve_cli

    assert serve_cli.RESTART_EXIT_CODE not in (0, 1)
    args = serve_cli.make_parser().parse_args(["--ckpt", "x", "--max_rss_gb", "40"])
    assert args.max_rss_gb == 40.0


def test_host_rss_gb_reports_positive():
    from toad_tpu.utils.profiling import host_rss_gb

    rss = host_rss_gb()
    assert rss > 0.01  # this test process certainly uses >10 MB
