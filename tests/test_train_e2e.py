"""End-to-end slice: synthetic dataset → fold training → eval outputs.

Mirrors the reference's dummy-dataset smoke run (docs/README.md:88-114) at
miniature scale: the model must actually learn the synthetic signal, the
checkpoint must round-trip, and eval must produce the reference CSV schema.
"""

import numpy as np
import pytest

from toad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from toad_tpu.data.splits import generate_splits
from toad_tpu.data.wsi_dataset import WSIBagDataset
from toad_tpu.evaluate.engine import evaluate_checkpoint, evaluate_split
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.train.checkpoint import restore_params
from toad_tpu.train.loop import FoldTrainer


@pytest.fixture(scope="module")
def trained(dummy_env, tmp_path_factory):
    results_dir = tmp_path_factory.mktemp("results")
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    n0 = ds.num_classes[0]
    counts = np.bincount(ds.labels, minlength=n0)
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
    splits = (ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test))
    cfg = TrainConfig(
        max_epochs=8,
        seed=1,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        optim=OptimConfig(lr=3e-4),
        data=DataConfig(batch_size=4, bucket_sizes=(64, 128, 256)),
    )
    trainer = FoldTrainer(cfg, fold=0, results_dir=results_dir)
    result = trainer.train(*splits, log_fn=lambda s: None)
    return {"trainer": trainer, "result": result, "splits": splits, "cfg": cfg, "results_dir": results_dir}


def test_learns_synthetic_signal(trained):
    r = trained["result"]
    # synthetic bags carry a strong class signal; 8 epochs must beat chance by a lot
    assert r["cls_test_acc"] > 0.5, r["cls_test_acc"]
    assert r["cls_test_auc"] > 0.8, r["cls_test_auc"]
    assert r["site_val_auc"] >= 0.0  # finite


def test_split_snapshot_written(trained):
    p = trained["results_dir"] / "splits_0.csv"
    assert p.exists()


def test_checkpoint_roundtrip(trained):
    trainer = trained["trainer"]
    params = restore_params(trainer.ckpt_path)
    orig = trained["result"]["params"]
    for a, b in zip(
        np.asarray(params["trunk"]["fc1"]["w"]).ravel()[:10],
        np.asarray(orig["trunk"]["fc1"]["w"]).ravel()[:10],
    ):
        assert a == b


def test_eval_engine_schema(trained):
    cfg = trained["cfg"]
    res = evaluate_checkpoint(
        trained["trainer"].ckpt_path,
        trained["splits"][2],
        cfg.model,
        batch_size=4,
    )
    df = res.df
    expected_cols = ["slide_id", "sex", "Y", "Y_hat", "site", "site_hat"] + [f"p_{c}" for c in range(18)] + ["site_p"]
    assert list(df.columns) == expected_cols
    assert len(df) == len(trained["splits"][2])
    # probabilities sum to 1 per row
    np.testing.assert_allclose(df[[f"p_{c}" for c in range(18)]].sum(axis=1), 1.0, rtol=1e-4)
    assert res.cls_auc > 0.8
    assert 1 in res.topk and 3 in res.topk and 5 in res.topk
    assert res.topk[3] >= res.topk[1]


def test_eval_matches_training_summary(trained):
    """Eval through the engine equals the trainer's own final test summary."""
    model = trained["trainer"].model
    res = evaluate_split(
        model,
        trained["result"]["params"],
        trained["splits"][2],
        batch_size=4,
    )
    np.testing.assert_allclose(res.cls_auc, trained["result"]["cls_test_auc"], atol=1e-6)


def test_batch_size_one_equivalence(trained):
    """batch_size=1 (reference semantics) gives the same eval metrics as batched."""
    model = trained["trainer"].model
    params = trained["result"]["params"]
    r1 = evaluate_split(model, params, trained["splits"][1], batch_size=1)
    r4 = evaluate_split(model, params, trained["splits"][1], batch_size=4)
    np.testing.assert_allclose(r1.cls_auc, r4.cls_auc, atol=1e-3)
    np.testing.assert_allclose(
        r1.df[[f"p_{c}" for c in range(18)]].to_numpy(),
        r4.df[[f"p_{c}" for c in range(18)]].to_numpy(),
        atol=2e-3,
    )


def test_val_per_class_tpr_logged(dummy_env, tmp_path):
    """The reference writes val/class_{i}_tpr + val site TPRs every epoch
    (core_utils_mtl_concat.py:345-356); our val scalar pass must too."""

    class RecordingWriter:
        def __init__(self):
            self.keys = set()

        def add_scalar(self, key, value, step):
            self.keys.add(key)

        def close(self):
            pass

    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    tiny = ds.subset(np.arange(24))
    cfg = TrainConfig(
        max_epochs=1,
        seed=0,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        data=DataConfig(batch_size=4, bucket_sizes=(64, 128, 256)),
        log_data=True,
    )
    w = RecordingWriter()
    FoldTrainer(cfg, fold=0, results_dir=tmp_path, writer=w).train(
        tiny, tiny, tiny, log_fn=lambda s: None
    )
    assert any(k.startswith("val/class_") and k.endswith("_tpr") for k in w.keys), sorted(w.keys)
    assert {"val/site_0_tpr", "train/class_0_tpr"} & w.keys, sorted(w.keys)
