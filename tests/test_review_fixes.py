"""Regression tests for data/native-layer review findings:

- numeric slide ids in ragged split CSVs must round-trip (pandas would
  float-ify NaN-padded columns -> '201.0' matched nothing -> empty split)
- split ids missing from the manifest must raise, not silently intersect
- numpy-2 array pickles inside torch-zip files must parse natively
- BagBatcher.__len__ must equal the actually-iterated batch count for every
  mode when bag lengths are resolvable (was a lower bound for weighted)
- native pack_bags buffer validation must raise real errors (not asserts)
"""

import numpy as np
import pytest

from toad_tpu.data.batching import BagBatcher
from toad_tpu.data.splits import load_split_csv, save_split_columnar
from toad_tpu.data.wsi_dataset import LabelVocabularyError, WSIBagDataset


def test_numeric_slide_ids_round_trip_split_csv(tmp_path):
    ids = {
        "train": [str(i) for i in range(100, 110)],
        "val": ["110", "111"],  # shorter than train -> NaN padding on read
        "test": ["112"],
    }
    path = tmp_path / "splits_0.csv"
    save_split_columnar(ids, path)
    out = load_split_csv(path)
    assert out["val"] == ["110", "111"], out["val"]  # not ['110.0', ...]
    assert out["test"] == ["112"]


def test_subset_by_unknown_slide_ids_raises(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]), print_info=False)
    good = [str(s) for s in ds.slide_ids[:3]]
    assert len(ds.subset_by_slide_ids(good)) == 3
    with pytest.raises(LabelVocabularyError, match="not in the dataset csv"):
        ds.subset_by_slide_ids(good + ["no-such-slide"])


def test_numpy2_array_in_torch_zip_parses_natively(tmp_path):
    torch = pytest.importorskip("torch")
    from toad_tpu.data.torch_io import load_torch_pickle

    payload = {
        "features": torch.arange(12, dtype=torch.float32).reshape(3, 4),
        "coords": np.array([[0, 1], [2, 3], [4, 5]], np.int64),  # raw numpy -> _codecs.encode path
        "note": "mixed container",
    }
    p = tmp_path / "mixed.pt"
    torch.save(payload, p)
    out = load_torch_pickle(p)
    np.testing.assert_array_equal(np.asarray(out["features"]), payload["features"].numpy())
    np.testing.assert_array_equal(np.asarray(out["coords"]), payload["coords"])


@pytest.mark.parametrize("mode", ["sequential", "shuffle", "weighted"])
def test_len_matches_iteration_every_mode(dummy_env, mode):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]), print_info=False)
    split = ds.subset(np.arange(ds.n_slides))
    b = BagBatcher(split, batch_size=4, bucket_sizes=(64, 128, 256), mode=mode, seed=3, prefetch=0)
    for epoch in (0, 1):
        b.set_epoch(epoch)
        n_iter = sum(1 for _ in b)
        assert len(b) == n_iter, (mode, epoch, len(b), n_iter)


def test_int8_with_explicit_bf16_resolves_to_int8_wire(dummy_env, monkeypatch):
    """ADVICE r3: int8=True + transfer_dtype='bfloat16' would double-round
    (f32->bf16->int8) — the engine must resolve it to the int8 wire
    (quantize straight from f32 in the producer) instead."""
    import jax

    import toad_tpu.evaluate.engine as eng
    from toad_tpu.config import ModelConfig
    from toad_tpu.models.toad_mil import ToadMIL

    captured = {}
    real = eng.BagBatcher

    def spy(*a, **kw):
        captured.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(eng, "BagBatcher", spy)
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]), print_info=False)
    split = ds.subset(np.arange(4))
    cfg = ModelConfig(in_dim=dummy_env["dim"], n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    eng.evaluate_split(model, params, split, int8=True, transfer_dtype="bfloat16",
                       batch_size=2, bucket_sizes=(256,))
    assert captured["transfer_dtype"] == "int8"
    # explicit float32 + int8 keeps the f32 wire (on-device quantize, no
    # double rounding either)
    captured.clear()
    eng.evaluate_split(model, params, split, int8=True, transfer_dtype="float32",
                       batch_size=2, bucket_sizes=(256,))
    assert captured["transfer_dtype"] == "float32"


def test_checkpoint_purge_handles_stale_plain_file(tmp_path):
    """ADVICE r3: a plain FILE matching the orbax unfinalized-tmp glob must
    be unlinked, not rmtree'd (NotADirectoryError killed the save)."""
    from toad_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    path = tmp_path / "ck"
    stale = tmp_path / "ck.orbax-checkpoint-tmp-123"
    stale.write_text("junk left by a hypothetical future orbax")
    save_checkpoint(path, {"a": np.float32(1.5)})
    assert not stale.exists()
    assert float(restore_checkpoint(path)["a"]) == 1.5


def test_batcher_device_put_honors_device(dummy_env):
    """ADVICE r3: BagBatcher(device=...) commits producer-placed arrays to
    the requested device instead of silently using the default."""
    import jax

    dev = jax.devices("cpu")[2]
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]), print_info=False)
    split = ds.subset(np.arange(3))
    b = next(iter(BagBatcher(split, batch_size=2, bucket_sizes=(256,), prefetch=0,
                             device_put=True, device=dev)))
    assert b.features.devices() == {dev}
    assert b.patch_mask.devices() == {dev}


def test_native_buffer_validation_raises(tmp_path):
    native = pytest.importorskip("toad_tpu.native")
    if not native.available():
        pytest.skip("native lib unavailable")
    bag = tmp_path / "b.npy"
    np.save(bag, np.ones((4, 8), np.float32))
    from toad_tpu.data.native_bags import resolve_payload

    p = resolve_payload(bag)
    out = np.zeros((1, 16, 8), np.float64)  # wrong dtype
    mask = np.zeros((1, 16), np.float32)
    with pytest.raises(ValueError, match="C-contiguous float32"):
        native.pack_bags([p.path], np.array([p.offset]), np.array([4]), 8, 16, out, mask)


def test_coords_sidecar_round_trip(tmp_path):
    """write_bag persists coords for formats that can't embed them (.npy/.pt)
    via a .coords.npy sidecar, and load_bag picks it up."""
    from toad_tpu.data.bags import load_bag
    from toad_tpu.pipeline.featurize import write_bag

    feats = np.random.default_rng(0).standard_normal((7, 16)).astype(np.float32)
    coords = np.arange(14, dtype=np.int64).reshape(7, 2)
    for fmt in ("npy", "pt"):
        p = tmp_path / f"slide.{fmt}"
        write_bag(p, feats, coords)
        got_f, got_c = load_bag(p, with_coords=True)
        np.testing.assert_allclose(np.asarray(got_f), feats, atol=1e-6)
        np.testing.assert_array_equal(got_c, coords)


def test_truncated_bag_aligns_coords(tmp_path):
    """A bag longer than the largest bucket is head-truncated; the returned
    coords must match the attention length (was a corrupt-h5/crash pair)."""
    import jax

    from toad_tpu.config import ModelConfig
    from toad_tpu.pipeline.featurize import write_bag
    from toad_tpu.pipeline.infer import SlideInference, infer_feature_bag

    cfg = ModelConfig(in_dim=16, n_classes=4)
    from toad_tpu.models.toad_mil import ToadMIL

    params = ToadMIL(cfg).init(jax.random.PRNGKey(0))
    inf = SlideInference(params, cfg, bucket_sizes=(8, 16))
    feats = np.random.default_rng(1).standard_normal((40, 16)).astype(np.float32)  # > max bucket
    coords = np.arange(80, dtype=np.int64).reshape(40, 2)
    p = tmp_path / "long.npy"
    write_bag(p, feats, coords)
    pred, got_c = infer_feature_bag(inf, p, sex=0)
    assert len(pred.attention) == 16
    assert got_c is not None and len(got_c) == len(pred.attention)
    np.testing.assert_array_equal(got_c, coords[:16])


def test_y_hat_matches_argmax_on_ties():
    from toad_tpu.pipeline.infer import SlidePrediction  # noqa: F401 (schema import)
    import jax

    from toad_tpu.config import ModelConfig
    from toad_tpu.models.toad_mil import ToadMIL
    from toad_tpu.pipeline.infer import SlideInference

    cfg = ModelConfig(in_dim=16, n_classes=4)
    params = ToadMIL(cfg).init(jax.random.PRNGKey(0))
    inf = SlideInference(params, cfg, bucket_sizes=(8,))
    feats = np.zeros((5, 16), np.float32)
    pred = inf.predict(feats, 0)
    assert pred.y_hat == int(np.asarray(pred.y_prob).argmax())
    assert pred.topk[0][0] == pred.y_hat or pred.y_prob[pred.topk[0][0]] == pred.y_prob[pred.y_hat]


def test_patient_bags_pack_natively(dummy_env):
    """PatientBagSplit packs through the native segment path (one pread per
    slide file at its cumulative row offset) since r4 — native='on' must
    succeed AND produce exactly the numpy fallback's batches."""
    from toad_tpu.data.wsi_dataset import PatientBagSplit

    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    pb = PatientBagSplit(ds.subset(np.arange(20)))
    kw = dict(batch_size=2, bucket_sizes=(256, 512, 1024), prefetch=0, mode="sequential")
    b_nat = BagBatcher(pb, native="on", **kw)
    batches = list(b_nat)
    assert batches and b_nat.native_active is True
    for a, c in zip(batches, BagBatcher(pb, native="off", **kw)):
        np.testing.assert_array_equal(np.asarray(a.features), np.asarray(c.features))
        np.testing.assert_array_equal(a.patch_mask, c.patch_mask)
        np.testing.assert_array_equal(a.label, c.label)
        np.testing.assert_array_equal(a.indices, c.indices)


def test_bucket_none_with_batching_warns(dummy_env):
    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    split = ds.subset(np.arange(8))
    with pytest.warns(UserWarning, match="exact length"):
        BagBatcher(split, batch_size=4, bucket_sizes=None)


def test_restore_params_template_is_enforced(tmp_path):
    """load-time failure with the parameter path named, not a late opaque
    shape error inside model.apply."""
    from toad_tpu.train.checkpoint import restore_params, save_checkpoint

    params = {"trunk": {"w": np.ones((4, 3), np.float32), "b": np.zeros((3,), np.float32)}}
    path = tmp_path / "ckpt"
    save_checkpoint(path, {"params": params, "epoch": np.int64(0)})

    ok = restore_params(path, {"trunk": {"w": np.zeros((4, 3), np.float32)}})
    assert "b" not in ok["trunk"]  # projection keeps only template keys

    with pytest.raises(ValueError, match=r"shape mismatch at params/trunk/w"):
        restore_params(path, {"trunk": {"w": np.zeros((5, 3), np.float32)}})
    with pytest.raises(KeyError, match="missing parameter params/trunk/nope"):
        restore_params(path, {"trunk": {"nope": np.zeros((1,), np.float32)}})


def test_render_heatmap_matches_naive_loop():
    """The difference-array + cumsum painter must reproduce the per-patch
    rectangle loop exactly (overlaps, edge clamps, off-canvas drops)."""
    from toad_tpu.pipeline.heatmap import render_heatmap

    rng = np.random.RandomState(7)
    ps, ds = 256, 32
    coords = rng.randint(-200, 4000, (300, 2)).astype(np.int64)
    scores = rng.rand(300).astype(np.float32)

    img = render_heatmap(coords, scores, patch_size=ps, downscale=ds, percentile=False)

    # naive oracle
    H = (int(coords[:, 1].max()) + ps) // ds
    W = (int(coords[:, 0].max()) + ps) // ds
    p = max(1, ps // ds)
    acc = np.zeros((H, W), np.float64)
    cnt = np.zeros((H, W), np.float64)
    for (x, y), s in zip(coords // ds, scores):
        if y >= H or x >= W or y < 0 or x < 0:
            continue
        acc[y : y + p, x : x + p] += s
        cnt[y : y + p, x : x + p] += 1.0
    heat = np.zeros((H, W), np.float32)
    heat[cnt > 0] = (acc[cnt > 0] / cnt[cnt > 0]).astype(np.float32)
    from toad_tpu.pipeline.heatmap import colorize

    expect = colorize(heat)
    expect[cnt == 0] = 255
    np.testing.assert_array_equal(img, expect)


def test_zero_tile_slide_writes_empty_patch_file(tmp_path):
    """Background-only or too-small slides must write an empty patch h5,
    not crash on an impossible chunk shape."""
    import h5py

    from toad_tpu.pipeline.tiling import tile_image, write_patch_h5

    img = np.full((100, 100, 3), 255, np.uint8)  # smaller than patch_size
    imgs, coords = tile_image(img, patch_size=256)
    assert imgs.shape == (0, 256, 256, 3)
    write_patch_h5(tmp_path / "empty.h5", imgs, coords)
    with h5py.File(tmp_path / "empty.h5", "r") as f:
        assert f["imgs"].shape == (0, 256, 256, 3)
        assert f["coords"].shape == (0, 2)


def test_pack_bags_rejects_oversized_nrows(tmp_path):
    from toad_tpu import native as native_lib

    if not native_lib.available():
        pytest.skip("native lib unavailable")
    payload = np.arange(32 * 4, dtype=np.float32)
    p = tmp_path / "bag.npy"
    payload.tofile(p)
    out = np.zeros((1, 16, 4), np.float32)
    mask = np.zeros((1, 16), np.float32)
    with pytest.raises(ValueError, match="overrun"):
        native_lib.pack_bags([str(p)], np.zeros(1, np.int64), np.array([32], np.int64), 4, 16, out, mask)
    with pytest.raises(ValueError, match="length 1"):
        native_lib.pack_bags([str(p)], np.zeros(2, np.int64), np.array([8, 8], np.int64), 4, 16, out, mask)


def test_bad_colormap_name_raises():
    from toad_tpu.pipeline.heatmap import colorize

    try:
        import matplotlib  # noqa: F401
    except ImportError:
        pytest.skip("matplotlib not installed")
    with pytest.raises(ValueError, match="virids"):
        colorize(np.linspace(0, 1, 5), cmap="virids")
