"""Numerical sanitizers (utils/debug.py): checkified train step.

Clean data must pass with outputs identical to the production step; NaN
features, non-finite loss paths, and out-of-range labels must raise with a
message naming the failing check (SURVEY §5 sanitizer row).
"""

import jax
import numpy as np
import pytest

from toad_tpu.config import ModelConfig, OptimConfig
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.train.loop import make_train_step
from toad_tpu.train.optim import make_optimizer
from toad_tpu.utils.debug import make_checked_step

DIM, N, B, C = 32, 16, 4, 5


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(in_dim=DIM, n_classes=C, dropout=True)
    model = ToadMIL(cfg)
    tx = make_optimizer(OptimConfig())
    params = model.init(jax.random.PRNGKey(0))
    return model, tx, params


def _batch(rng, label_hi=C):
    return {
        "features": rng.standard_normal((B, N, DIM)).astype(np.float32),
        "patch_mask": np.ones((B, N), np.float32),
        "bag_mask": np.ones((B,), np.float32),
        "label": rng.integers(0, label_hi, B).astype(np.int32),
        "site": rng.integers(0, 2, B).astype(np.int32),
        "sex": rng.integers(0, 2, B).astype(np.int32),
    }


def test_checked_step_matches_production(setup):
    model, tx, params = setup
    batch = _batch(np.random.default_rng(0))
    key = jax.random.PRNGKey(1)

    prod = make_train_step(model, tx, 0.75, 0.25)
    chk = make_checked_step(model, tx, 0.75, 0.25)
    fresh = lambda: jax.tree.map(lambda a: np.array(a), params)  # prod donates its inputs
    p1, o1, m1 = prod(fresh(), tx.init(fresh()), key, dict(batch))
    p2, o2, m2 = chk(fresh(), tx.init(fresh()), key, dict(batch))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_nan_features_raise(setup):
    model, tx, params = setup
    batch = _batch(np.random.default_rng(1))
    batch["features"][0, 0, 0] = np.nan
    chk = make_checked_step(model, tx, 0.75, 0.25)
    with pytest.raises(Exception, match="non-finite feature"):
        chk(params, tx.init(params), jax.random.PRNGKey(1), batch)


def test_label_out_of_range_raises(setup):
    model, tx, params = setup
    batch = _batch(np.random.default_rng(2))
    batch["label"][2] = C + 7
    chk = make_checked_step(model, tx, 0.75, 0.25)
    with pytest.raises(Exception, match="origin label out of range"):
        chk(params, tx.init(params), jax.random.PRNGKey(1), batch)
    batch = _batch(np.random.default_rng(3))
    batch["sex"][0] = 4
    with pytest.raises(Exception, match="sex must be 0/1"):
        chk(params, tx.init(params), jax.random.PRNGKey(1), batch)


def test_fold_trainer_with_debug_checks(dummy_env, tmp_path):
    """cfg.debug_checks swaps in the checkified step; a clean epoch trains."""
    from toad_tpu.config import DataConfig, TrainConfig
    from toad_tpu.data.splits import generate_splits
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.train.loop import FoldTrainer

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
    cfg = TrainConfig(
        max_epochs=1,
        debug_checks=True,
        model=ModelConfig(in_dim=dummy_env["dim"], n_classes=18),
        data=DataConfig(batch_size=4, bucket_sizes=(64, 128, 256)),
    )
    trainer = FoldTrainer(cfg, fold=0, results_dir=tmp_path)
    result = trainer.train(ds.subset(spec.train), ds.subset(spec.val), ds.subset(spec.test), log_fn=lambda s: None)
    assert np.isfinite(result["cls_test_auc"])


def test_masked_out_bags_may_carry_garbage_labels(setup):
    """Padding rows (bag_mask 0) are exempt from label-range checks —
    the batcher fills them with zeros but must not be required to."""
    model, tx, params = setup
    batch = _batch(np.random.default_rng(4))
    batch["bag_mask"][3] = 0.0
    batch["label"][3] = 99
    chk = make_checked_step(model, tx, 0.75, 0.25)
    chk(params, tx.init(params), jax.random.PRNGKey(1), batch)  # no raise
