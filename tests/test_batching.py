"""Bucketed batching: coverage, masks, padding, sampling modes."""

import numpy as np

from toad_tpu.data.batching import BagBatcher, bucket_for
from toad_tpu.data.wsi_dataset import WSIBagDataset


def test_bucket_for():
    assert bucket_for(1, (256, 512)) == 256
    assert bucket_for(256, (256, 512)) == 256
    assert bucket_for(257, (256, 512)) == 512
    assert bucket_for(9999, (256, 512)) == 512  # clamps to largest


def _split(dummy_env, n=40):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    return ds.subset(np.arange(n))


def test_sequential_covers_every_bag_once(dummy_env):
    split = _split(dummy_env)
    batcher = BagBatcher(split, batch_size=4, bucket_sizes=(64, 128, 256), mode="sequential", prefetch=0)
    seen = []
    for b in batcher:
        assert b.features.shape[0] == 4  # static batch dim even for partials
        valid = b.bag_mask > 0
        seen.extend(b.indices[valid].tolist())
        # padded patches have zero mask and zero features
        for j in range(4):
            n_real = int(b.patch_mask[j].sum())
            if b.bag_mask[j] > 0:
                assert np.all(b.features[j, n_real:] == 0)
            else:
                assert b.indices[j] == -1
    assert sorted(seen) == list(range(len(split)))


def test_labels_match_split(dummy_env):
    split = _split(dummy_env)
    batcher = BagBatcher(split, batch_size=2, bucket_sizes=(64, 128, 256), mode="sequential", prefetch=0)
    for b in batcher:
        for j in range(2):
            if b.bag_mask[j] > 0:
                i = int(b.indices[j])
                assert b.label[j] == split.labels[i]
                assert b.site[j] == split.sites[i]
                assert b.sex[j] == split.sexes[i]


def test_shuffle_changes_order_but_not_coverage(dummy_env):
    split = _split(dummy_env)
    batcher = BagBatcher(split, batch_size=1, bucket_sizes=(256,), mode="shuffle", seed=1, prefetch=0)
    batcher.set_epoch(0)
    order0 = [int(b.indices[0]) for b in batcher]
    batcher.set_epoch(1)
    order1 = [int(b.indices[0]) for b in batcher]
    assert sorted(order0) == list(range(len(split)))
    assert sorted(order1) == list(range(len(split)))
    assert order0 != order1


def test_weighted_mode_oversamples_rare(dummy_env):
    split = _split(dummy_env, n=60)
    batcher = BagBatcher(split, batch_size=1, bucket_sizes=(256,), mode="weighted", seed=0, prefetch=0)
    counts = np.zeros(18)
    for _ in range(5):
        for b in batcher:
            counts[int(b.label[0])] += 1
        batcher.set_epoch(np.random.randint(10000))
    present = np.bincount(split.labels, minlength=18) > 0
    assert counts[present].min() > 0  # every present class gets sampled


def test_max_bag_size_truncates(dummy_env):
    split = _split(dummy_env)
    batcher = BagBatcher(split, batch_size=1, bucket_sizes=(64,), max_bag_size=64, mode="sequential", prefetch=0)
    for b in batcher:
        assert b.features.shape[1] == 64


def test_prefetch_equals_direct(dummy_env):
    split = _split(dummy_env)
    kw = dict(batch_size=2, bucket_sizes=(64, 128, 256), mode="sequential")
    direct = [b.indices.tolist() for b in BagBatcher(split, prefetch=0, **kw)]
    pref = [b.indices.tolist() for b in BagBatcher(split, prefetch=3, **kw)]
    assert direct == pref


def test_len_exact_across_buckets(tmp_path):
    """__len__ counts per-bucket partial batches (was ceil(n/batch))."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.synthetic import dummy_task, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=8, max_slides_per_patient=1, seed=0)
    task = dummy_task(str(csv))
    bags_dir = tmp_path / "bags"
    bags_dir.mkdir()
    rng = np.random.RandomState(0)
    # 4 small bags (bucket 32), 4 large (bucket 64)
    for i, row in enumerate(manifest.itertuples()):
        n = 20 if i < 4 else 50
        np.save(bags_dir / f"{row.slide_id}.npy", rng.randn(n, 8).astype(np.float32))
    ds = WSIBagDataset(task, data_dir=str(bags_dir), print_info=False)
    split = ds.subset(np.arange(8))
    b = BagBatcher(split, batch_size=8, bucket_sizes=(32, 64), prefetch=0)
    batches = list(b)
    assert len(batches) == 2  # one partial batch per bucket
    assert len(b) == 2  # exact, not ceil(8/8)=1
    # shuffle mode: same count (grouping is order-independent)
    b2 = BagBatcher(split, batch_size=8, bucket_sizes=(32, 64), mode="shuffle", prefetch=0)
    assert len(b2) == 2


def test_prefetch_producer_stops_on_abandoned_iterator():
    """Abandoning the generator mid-iteration must not leave the producer
    blocked on the bounded queue forever."""
    import threading
    import time

    from toad_tpu.data.batching import _prefetch_iter

    produced = []

    def make():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = _prefetch_iter(make, depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert len(produced) < 1000  # it actually stopped early


def test_bf16_transfer_dtype(tmp_path):
    """transfer_dtype='bfloat16' halves feature bytes; values round-trip
    within bf16 precision and masks/labels stay exact."""
    import ml_dtypes

    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=6, max_slides_per_patient=1, seed=0)
    task = dummy_task(str(csv))
    write_dummy_bags(tmp_path / "bags", manifest, task, n_patches_range=(8, 20), dim=16, fmt="npy", seed=0)
    ds = WSIBagDataset(task, data_dir=str(tmp_path / "bags"), print_info=False)
    split = ds.subset(np.arange(len(ds.slide_ids)))

    kw = dict(batch_size=3, bucket_sizes=(32,), prefetch=2)
    b32 = list(BagBatcher(split, **kw))
    b16 = list(BagBatcher(split, transfer_dtype="bfloat16", **kw))
    for a, b in zip(b32, b16):
        assert b.features.dtype == np.dtype(ml_dtypes.bfloat16)
        assert b.features.nbytes == a.features.nbytes // 2
        np.testing.assert_allclose(b.features.astype(np.float32), a.features, rtol=8e-3, atol=1e-2)
        np.testing.assert_array_equal(a.patch_mask, b.patch_mask)
        np.testing.assert_array_equal(a.label, b.label)


def test_suggest_and_auto_bucket_ladder(dummy_env):
    """Data-derived ladder: quantile rungs, multiples enforced, every bag
    fits the top rung; patient-concat mode sums each case's slides."""
    from toad_tpu.data.bags import bag_shape
    from toad_tpu.data.batching import auto_bucket_ladder, suggest_buckets
    from toad_tpu.data.wsi_dataset import PatientBagSplit, WSIBagDataset

    counts = np.array([100, 130, 140, 600, 610, 2000])
    lad = suggest_buckets(counts)
    assert lad == sorted(set(lad)) and all(b % 128 == 0 for b in lad)
    assert lad[-1] >= 2000
    assert suggest_buckets(counts, multiple_of=384)[-1] % 384 == 0
    assert suggest_buckets(np.array([])) == []

    ds = WSIBagDataset(dummy_env["task"], data_dir=dummy_env["data_dir"], print_info=False)
    split = ds.subset(range(ds.n_slides))
    lad = auto_bucket_ladder(split)
    n_max = max(bag_shape(split.bag_file(i))[0] for i in range(len(split)))
    assert lad[-1] >= n_max and all(b % 128 == 0 for b in lad)

    pb = PatientBagSplit(split)
    lad_pb = auto_bucket_ladder(pb, multiple_of=256)
    concat_max = max(
        sum(bag_shape(split.bag_file(int(i)))[0] for i in g) for g in pb.groups
    )
    assert lad_pb[-1] >= concat_max and all(b % 256 == 0 for b in lad_pb)


def test_resolve_buckets_flag():
    """--buckets parsing: explicit list sorted+validated, 'auto' plumbed,
    invalid multiples rejected."""
    import argparse

    import pytest

    from toad_tpu.cli.train import resolve_buckets

    ns = argparse.Namespace(buckets="512,256,1024", bag_shards=1, patient_bags=False)
    assert resolve_buckets(ns, None) == (256, 512, 1024)
    ns.buckets = None
    assert resolve_buckets(ns, None) is None
    ns.buckets = "300"
    with pytest.raises(SystemExit, match="multiples of 128"):
        resolve_buckets(ns, None)
    ns.buckets, ns.bag_shards = "512", 3  # 128*3=384: 512 invalid
    with pytest.raises(SystemExit, match="384"):
        resolve_buckets(ns, None)
    # power-of-two shard counts: the constraint is 128*shards, NOT
    # lcm(128, shards)=128 — each SHARD's local slice needs the 128 tile
    ns.buckets, ns.bag_shards = "384", 4
    with pytest.raises(SystemExit, match="512"):
        resolve_buckets(ns, None)
    ns.buckets = "1024,512"
    assert resolve_buckets(ns, None) == (512, 1024)


def test_auto_bucket_ladder_skips_missing_bags(dummy_env, tmp_path, capsys):
    """One unfeaturized slide must not crash the ladder derivation — it may
    be in no split the run uses (validate is the loud pre-flight)."""
    import shutil

    from toad_tpu.data.batching import auto_bucket_ladder
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    bags = tmp_path / "bags"
    shutil.copytree(dummy_env["data_dir"], bags)
    victim = sorted(bags.glob("*.npy"))[0]
    victim.unlink()
    ds = WSIBagDataset(dummy_env["task"], data_dir=bags, print_info=False)
    lad = auto_bucket_ladder(ds.subset(range(ds.n_slides)))
    assert lad and all(b % 128 == 0 for b in lad)
    assert "skipped 1 missing" in capsys.readouterr().out


def test_device_put_places_heavy_fields_only(dummy_env):
    """device_put=True: producer-thread async H2D of features/patch_mask
    (jax.Array out), while per-bag host fields stay numpy so metric assembly
    never forces a device sync."""
    import jax

    split = _split(dummy_env, n=8)
    batcher = BagBatcher(split, batch_size=4, bucket_sizes=(64, 128, 256), device_put=True)
    ref = BagBatcher(split, batch_size=4, bucket_sizes=(64, 128, 256), device_put=False)
    got = list(batcher)
    want = list(ref)
    assert len(got) == len(want) > 0
    for b, w in zip(got, want):
        assert isinstance(b.features, jax.Array)
        assert isinstance(b.patch_mask, jax.Array)
        assert isinstance(b.label, np.ndarray)
        assert isinstance(b.bag_mask, np.ndarray)
        np.testing.assert_array_equal(np.asarray(b.features), w.features)
        np.testing.assert_array_equal(np.asarray(b.patch_mask), w.patch_mask)


def test_device_put_guard_skips_giant_batches(dummy_env, monkeypatch):
    """Batches above the HBM guard fall back to host-resident features."""
    split = _split(dummy_env, n=4)
    batcher = BagBatcher(split, batch_size=2, bucket_sizes=(64,), device_put=True)
    monkeypatch.setattr(BagBatcher, "_DEVICE_PUT_MAX_BYTES", 1)
    for b in batcher:
        assert isinstance(b.features, np.ndarray)


def test_transfer_dtype_auto_resolution():
    """'auto' = bf16 wire iff the model computes in bf16 (numerically
    invisible there); explicit values pass through untouched."""
    from toad_tpu.data.batching import resolve_transfer_dtype

    assert resolve_transfer_dtype("auto", "bfloat16") == "bfloat16"
    assert resolve_transfer_dtype("auto", "float32") == "float32"
    assert resolve_transfer_dtype("float32", "bfloat16") == "float32"
    assert resolve_transfer_dtype("bfloat16", "float32") == "bfloat16"


def test_batcher_rejects_unresolved_auto(dummy_env):
    """BagBatcher has no model to resolve against — 'auto' must be resolved
    by the caller (FoldTrainer / evaluate_split), not silently defaulted."""
    import pytest

    with pytest.raises(ValueError, match="auto"):
        BagBatcher(_split(dummy_env, n=2), transfer_dtype="auto")


def test_trainer_rejects_int8_wire(dummy_env, tmp_path):
    """int8 is an eval-only wire: the train step has no dequant path, so the
    trainer must refuse loudly instead of training on unscaled integers."""
    import pytest

    from toad_tpu.config import DataConfig, TrainConfig
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.train.loop import FoldTrainer

    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    cfg = TrainConfig(max_epochs=1, data=DataConfig(transfer_dtype="int8", bucket_sizes=(64,)))
    tr = FoldTrainer(cfg, fold=0, results_dir=str(tmp_path))
    with pytest.raises(ValueError, match="eval-only"):
        tr._batcher(ds.subset(np.arange(4)), training=True)
