"""Native C++ bag IO: compile/load, payload resolution per format, zero-copy
packing parity with the numpy loader, and BagBatcher integration."""

import numpy as np
import pytest

from toad_tpu import native
from toad_tpu.data.native_bags import resolve_payload

pytestmark = pytest.mark.skipif(not native.available(), reason=f"native lib unavailable: {native.failure_reason()}")


def _write_all_formats(tmp_path, feats):
    import h5py

    import torch

    paths = {}
    np.save(tmp_path / "bag.npy", feats)
    paths["npy"] = tmp_path / "bag.npy"
    torch.save(torch.from_numpy(feats), tmp_path / "bag.pt")
    paths["pt"] = tmp_path / "bag.pt"
    with h5py.File(tmp_path / "bag.h5", "w") as f:
        f.create_dataset("features", data=feats)
    paths["h5"] = tmp_path / "bag.h5"
    return paths


@pytest.mark.parametrize("fmt", ["npy", "pt", "h5"])
def test_resolve_and_pack_each_format(tmp_path, fmt):
    rng = np.random.RandomState(0)
    feats = rng.randn(57, 32).astype(np.float32)
    paths = _write_all_formats(tmp_path, feats)
    info = resolve_payload(paths[fmt])
    assert info is not None, fmt
    assert (info.nrows, info.dim) == (57, 32)

    bucket = 64
    out = np.zeros((1, bucket, 32), np.float32)
    mask = np.zeros((1, bucket), np.float32)
    native.pack_bags([info.path], np.array([info.offset]), np.array([info.nrows]), 32, bucket, out, mask)
    np.testing.assert_array_equal(out[0, :57], feats)
    np.testing.assert_array_equal(out[0, 57:], 0.0)
    np.testing.assert_array_equal(mask[0], np.concatenate([np.ones(57), np.zeros(7)]).astype(np.float32))


def test_pack_many_multithreaded(tmp_path):
    rng = np.random.RandomState(1)
    bags = [rng.randn(rng.randint(5, 40), 16).astype(np.float32) for _ in range(24)]
    infos = []
    for i, b in enumerate(bags):
        np.save(tmp_path / f"b{i}.npy", b)
        infos.append(resolve_payload(tmp_path / f"b{i}.npy"))
    bucket = 48
    out = np.zeros((24, bucket, 16), np.float32)
    mask = np.zeros((24, bucket), np.float32)
    native.pack_bags(
        [i.path for i in infos],
        np.array([i.offset for i in infos]),
        np.array([i.nrows for i in infos]),
        16, bucket, out, mask, nthreads=8,
    )
    for j, b in enumerate(bags):
        np.testing.assert_array_equal(out[j, : len(b)], b)
        assert mask[j].sum() == len(b)


def test_truncation_via_nrows(tmp_path):
    feats = np.arange(20 * 4, dtype=np.float32).reshape(20, 4)
    np.save(tmp_path / "t.npy", feats)
    info = resolve_payload(tmp_path / "t.npy")
    out = np.zeros((1, 8, 4), np.float32)
    mask = np.zeros((1, 8), np.float32)
    native.pack_bags([info.path], np.array([info.offset]), np.array([8]), 4, 8, out, mask)
    np.testing.assert_array_equal(out[0], feats[:8])
    assert mask.sum() == 8


def test_missing_file_raises(tmp_path):
    out = np.zeros((1, 8, 4), np.float32)
    mask = np.zeros((1, 8), np.float32)
    with pytest.raises(IOError, match="nope.npy"):
        native.pack_bags([str(tmp_path / "nope.npy")], np.array([0]), np.array([4]), 4, 8, out, mask)


def test_resolver_rejects_ineligible(tmp_path):
    import h5py

    # float64 npy
    np.save(tmp_path / "f64.npy", np.zeros((4, 4)))
    assert resolve_payload(tmp_path / "f64.npy") is None
    # chunked/compressed h5
    with h5py.File(tmp_path / "c.h5", "w") as f:
        f.create_dataset("features", data=np.zeros((8, 8), np.float32), chunks=(4, 8), compression="gzip")
    assert resolve_payload(tmp_path / "c.h5") is None
    # fortran-order npy
    np.save(tmp_path / "fo.npy", np.asfortranarray(np.zeros((4, 4), np.float32)))
    assert resolve_payload(tmp_path / "fo.npy") is None


@pytest.mark.parametrize("fmt", ["npy", "pt"])
def test_batcher_native_matches_python(tmp_path, fmt):
    """native='on' and native='off' produce identical batches."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=25, max_slides_per_patient=1, seed=3)
    task = dummy_task(str(csv))
    write_dummy_bags(tmp_path / "bags", manifest, task, n_patches_range=(16, 90), dim=24, fmt=fmt, seed=3)
    ds = WSIBagDataset(task, data_dir=str(tmp_path / "bags"), print_info=False)
    split = ds.subset(np.arange(len(ds.slide_ids)))

    kw = dict(batch_size=4, bucket_sizes=(32, 64, 128), mode="shuffle", seed=5, prefetch=0)
    b_py = list(BagBatcher(split, native="off", **kw))
    batcher_nat = BagBatcher(split, native="on", **kw)
    b_nat = list(batcher_nat)
    assert batcher_nat.native_active is True
    assert len(b_py) == len(b_nat)
    for a, b in zip(b_py, b_nat):
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.patch_mask, b.patch_mask)
        np.testing.assert_array_equal(a.label, b.label)
        np.testing.assert_array_equal(a.indices, b.indices)


def test_pack_bags_bf16_matches_numpy_cast(tmp_path):
    """The fused read+bf16 packer is bit-identical to numpy's f32->bf16 cast
    (round-to-nearest-even), including halfway points, overflow-to-inf, and
    subnormals."""
    import ml_dtypes

    rng = np.random.RandomState(7)
    feats = (rng.randn(33, 16) * 10.0 ** rng.randint(-20, 20, (33, 16))).astype(np.float32)
    # adversarial values: exact ties, overflow, inf, tiny
    feats[0, :8] = [0.0, -0.0, 1.0, np.inf, -np.inf, 3.4e38, 1e-40, 1.00390625]
    np.save(tmp_path / "b.npy", feats)
    info = resolve_payload(tmp_path / "b.npy")
    bucket = 40
    out = np.zeros((1, bucket, 16), ml_dtypes.bfloat16)
    mask = np.zeros((1, bucket), np.float32)
    native.pack_bags_bf16([info.path], np.array([info.offset]), np.array([info.nrows]),
                          16, bucket, out.view(np.uint16), mask)
    np.testing.assert_array_equal(
        out[0, :33].view(np.uint16), feats.astype(ml_dtypes.bfloat16).view(np.uint16)
    )
    np.testing.assert_array_equal(out[0, 33:].view(np.uint16), 0)
    assert mask.sum() == 33


def test_pack_bags_int8_matches_quantize_rows_np(tmp_path):
    """The fused read+quantize packer is the exact twin of
    ops/quantize.py::quantize_rows_np (same scales, same q, bit for bit)."""
    from toad_tpu.ops.quantize import quantize_rows_np

    rng = np.random.RandomState(8)
    feats = rng.randn(29, 24).astype(np.float32) * 3.7
    feats[3] = 0.0  # all-zero row: amax floor path
    feats[4, 0] = 1e-9  # sub-floor amax
    np.save(tmp_path / "q.npy", feats)
    info = resolve_payload(tmp_path / "q.npy")
    bucket = 32
    q = np.zeros((1, bucket, 24), np.int8)
    s = np.full((1, bucket), 1.0 / 127.0, np.float32)
    mask = np.zeros((1, bucket), np.float32)
    native.pack_bags_int8([info.path], np.array([info.offset]), np.array([info.nrows]),
                          24, bucket, q, s, mask)
    q_ref, s_ref = quantize_rows_np(feats)
    np.testing.assert_array_equal(q[0, :29], q_ref)
    np.testing.assert_array_equal(s[0, :29], s_ref)
    np.testing.assert_array_equal(q[0, 29:], 0)
    np.testing.assert_array_equal(s[0, 29:], np.float32(1.0 / 127.0))  # prefill kept
    assert mask.sum() == 29


@pytest.mark.parametrize("wire", ["bfloat16", "int8"])
def test_batcher_native_wire_matches_python(tmp_path, wire):
    """transfer_dtype wires through the fused native packers produce exactly
    the batches the numpy conversion path produces."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=13, max_slides_per_patient=1, seed=4)
    task = dummy_task(str(csv))
    write_dummy_bags(tmp_path / "bags", manifest, task, n_patches_range=(16, 90), dim=24, fmt="npy", seed=4)
    ds = WSIBagDataset(task, data_dir=str(tmp_path / "bags"), print_info=False)
    split = ds.subset(np.arange(len(ds.slide_ids)))

    kw = dict(batch_size=4, bucket_sizes=(32, 64, 128), mode="shuffle", seed=5,
              prefetch=0, transfer_dtype=wire)
    b_py = list(BagBatcher(split, native="off", **kw))
    batcher_nat = BagBatcher(split, native="on", **kw)
    b_nat = list(batcher_nat)
    assert batcher_nat.native_active is True
    assert len(b_py) == len(b_nat)
    for a, b in zip(b_py, b_nat):
        assert a.features.dtype == b.features.dtype
        np.testing.assert_array_equal(np.asarray(a.features), np.asarray(b.features))
        np.testing.assert_array_equal(a.patch_mask, b.patch_mask)
        if wire == "int8":
            np.testing.assert_array_equal(a.scales, b.scales)
        np.testing.assert_array_equal(a.label, b.label)


def test_batcher_native_on_unsupported_raises(tmp_path):
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=6, max_slides_per_patient=1, seed=0)
    task = dummy_task(str(csv))
    write_dummy_bags(tmp_path / "bags", manifest, task, n_patches_range=(8, 16), dim=8, fmt="npz", seed=0)
    ds = WSIBagDataset(task, data_dir=str(tmp_path / "bags"), print_info=False)
    split = ds.subset(np.arange(len(ds.slide_ids)))
    with pytest.raises(RuntimeError, match="native bag IO requested"):
        list(BagBatcher(split, batch_size=2, native="on", prefetch=0))
    # auto mode silently falls back
    batcher = BagBatcher(split, batch_size=2, native="auto", prefetch=0)
    assert len(list(batcher)) > 0
    assert batcher.native_active is False


def test_mixed_dim_store_falls_back(tmp_path):
    """Bags with disagreeing feature dims must NOT take the native path (a
    wrong-dim pread would silently produce garbage); auto mode falls back and
    the numpy path raises its loud shape error at assemble time."""
    from toad_tpu.data.batching import BagBatcher

    class FakeSplit:
        labels = np.zeros(2, np.int32)
        sites = np.zeros(2, np.int32)
        sexes = np.zeros(2, np.int32)

        def __len__(self):
            return 2

        def bag_file(self, i):
            return tmp_path / f"b{i}.npy"

        def load_bag(self, i):
            return np.load(self.bag_file(i))

        def class_weights(self):
            return np.ones(2)

    np.save(tmp_path / "b0.npy", np.zeros((10, 16), np.float32))
    np.save(tmp_path / "b1.npy", np.zeros((10, 32), np.float32))
    batcher = BagBatcher(FakeSplit(), batch_size=1, bucket_sizes=(16,), prefetch=0, native="auto")
    assert batcher._native_ready() is False  # mixed dims -> python path


def test_truncated_npy_is_ineligible_not_fatal(tmp_path):
    p = tmp_path / "trunc.npy"
    p.write_bytes(b"\x93NUMPY")  # magic only, nothing else
    assert resolve_payload(p) is None


# -- int8 STORE read-through (pack_bags_q8) ----------------------------------


def test_resolve_payload_q8(tmp_path):
    """resolve_payload_q8 locates the raw int8 + scales payloads of a
    save_int8_bag store; raw byte reads at those offsets reproduce
    load_bag_quantized exactly. Plain f32 bags resolve to None."""
    from toad_tpu.data.bags import load_bag_quantized, save_int8_bag
    from toad_tpu.data.native_bags import resolve_payload_q8

    rng = np.random.RandomState(11)
    feats = rng.randn(21, 24).astype(np.float32)
    p = tmp_path / "q.npz"
    save_int8_bag(p, feats, coords=rng.randint(0, 100, (21, 2)))
    info = resolve_payload_q8(p)
    assert info is not None and (info.nrows, info.dim) == (21, 24)
    xq, scales, _ = load_bag_quantized(p)
    raw = p.read_bytes()
    got_q = np.frombuffer(raw, np.int8, 21 * 24, info.offset).reshape(21, 24)
    got_s = np.frombuffer(raw, np.float32, 21, info.scales_offset)
    np.testing.assert_array_equal(got_q, xq)
    np.testing.assert_array_equal(got_s, scales)
    # not an int8 store -> None
    np.savez(tmp_path / "f.npz", features=feats)
    assert resolve_payload_q8(tmp_path / "f.npz") is None
    assert resolve_payload_q8(tmp_path / "q.npz").path.endswith("q.npz")
    assert resolve_payload_q8(tmp_path / "missing.npz") is None


def test_pack_bags_q8_reads_through(tmp_path):
    from toad_tpu.data.bags import load_bag_quantized, save_int8_bag
    from toad_tpu.data.native_bags import resolve_payload_q8

    rng = np.random.RandomState(12)
    bags = [rng.randn(n, 16).astype(np.float32) for n in (9, 30)]
    infos = []
    for i, f in enumerate(bags):
        save_int8_bag(tmp_path / f"b{i}.npz", f)
        infos.append(resolve_payload_q8(tmp_path / f"b{i}.npz"))
    bucket = 32
    q = np.zeros((2, bucket, 16), np.int8)
    s = np.full((2, bucket), 1.0 / 127.0, np.float32)
    mask = np.zeros((2, bucket), np.float32)
    native.pack_bags_q8(
        [i.path for i in infos],
        np.array([i.offset for i in infos]),
        np.array([i.scales_offset for i in infos]),
        np.array([i.nrows for i in infos]), 16, bucket, q, s, mask,
    )
    for j, f in enumerate(bags):
        xq, scales, _ = load_bag_quantized(tmp_path / f"b{j}.npz")
        n = f.shape[0]
        np.testing.assert_array_equal(q[j, :n], xq)
        np.testing.assert_array_equal(s[j, :n], scales)
        np.testing.assert_array_equal(q[j, n:], 0)
        np.testing.assert_array_equal(s[j, n:], np.float32(1.0 / 127.0))
        assert mask[j].sum() == n


def test_batcher_int8_store_native_matches_python(tmp_path):
    """An int8 STORE on the int8 wire: the native read-through must equal the
    python fallback (dequantize -> requantize) bit for bit — which also
    proves the requant round-trip is exact."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.bags import save_int8_bag
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=9, max_slides_per_patient=1, seed=6)
    task = dummy_task(str(csv))
    # build an int8 STORE: synthesize f32 then convert, like cli export would
    write_dummy_bags(tmp_path / "f32", manifest, task, n_patches_range=(10, 60), dim=16, fmt="npy", seed=6)
    store = tmp_path / "store"
    for f in (tmp_path / "f32").glob("*.npy"):
        save_int8_bag(store / f.with_suffix(".npz").name, np.load(f))
    ds = WSIBagDataset(task, data_dir=str(store), print_info=False)
    split = ds.subset(np.arange(len(ds.slide_ids)))

    kw = dict(batch_size=4, bucket_sizes=(32, 64), mode="sequential", prefetch=0,
              transfer_dtype="int8")
    b_nat = BagBatcher(split, native="on", **kw)   # on: raises if ineligible
    batches_nat = list(b_nat)
    assert b_nat.native_active is True
    b_py = BagBatcher(split, native="off", **kw)
    batches_py = list(b_py)
    assert len(batches_nat) == len(batches_py) > 0
    for a, b in zip(batches_nat, batches_py):
        np.testing.assert_array_equal(np.asarray(a.features), np.asarray(b.features))
        np.testing.assert_array_equal(a.scales, b.scales)
        np.testing.assert_array_equal(a.patch_mask, b.patch_mask)
        np.testing.assert_array_equal(a.indices, b.indices)
    # exact __len__ now that int8 stores resolve lengths from metadata
    assert len(b_nat) == len(batches_nat)
    # any other wire: store needs the dequant fallback -> native ineligible
    b_f32 = BagBatcher(split, native="auto", transfer_dtype="float32",
                       batch_size=4, bucket_sizes=(32, 64), prefetch=0)
    next(iter(b_f32))
    assert b_f32.native_active is False


def test_batcher_mixed_f32_and_int8_store(tmp_path):
    """A split mixing f32 bags and int8-store bags on the int8 wire: the
    native path packs each kind with its packer (stores sorted last in the
    batch); per-slide rows must match the python fallback."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.bags import save_int8_bag
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    manifest = write_dummy_csv(csv, n_patients=8, max_slides_per_patient=1, seed=9)
    task = dummy_task(str(csv))
    bags = tmp_path / "bags"
    write_dummy_bags(bags, manifest, task, n_patches_range=(12, 30), dim=16, fmt="npy", seed=9)
    # convert every second bag to an int8 store (find_bag_file prefers .npy,
    # so delete the original)
    for j, f in enumerate(sorted(bags.glob("*.npy"))):
        if j % 2:
            save_int8_bag(f.with_suffix(".npz"), np.load(f))
            f.unlink()
    ds = WSIBagDataset(task, data_dir=str(bags), print_info=False)
    split = ds.subset(np.arange(len(ds.slide_ids)))

    kw = dict(batch_size=4, bucket_sizes=(32,), mode="sequential", prefetch=0,
              transfer_dtype="int8")
    b_nat = BagBatcher(split, native="on", **kw)
    by_idx_nat = {}
    for batch in b_nat:
        for r, i in enumerate(batch.indices):
            if i >= 0:
                by_idx_nat[int(i)] = (np.asarray(batch.features[r]), batch.scales[r],
                                      batch.patch_mask[r])
    assert b_nat.native_active is True
    for batch in BagBatcher(split, native="off", **kw):
        for r, i in enumerate(batch.indices):
            if i < 0:
                continue
            fq, fs, fm = by_idx_nat[int(i)]
            np.testing.assert_array_equal(fq, np.asarray(batch.features[r]))
            np.testing.assert_array_equal(fs, batch.scales[r])
            np.testing.assert_array_equal(fm, batch.patch_mask[r])


def test_structureless_split_falls_back_under_native_on(tmp_path):
    """A split exposing neither bag_file nor groups (only the load_bag
    contract) is STRUCTURALLY ineligible: documented silent fallback even
    under native='on' — not a RuntimeError."""
    from toad_tpu.data.batching import BagBatcher

    class MinimalSplit:
        labels = np.zeros(3, np.int32)
        sites = np.zeros(3, np.int32)
        sexes = np.zeros(3, np.int32)

        def __len__(self):
            return 3

        def load_bag(self, i):
            return np.full((8, 16), float(i), np.float32)

        def class_weights(self):
            return np.ones(3)

    b = BagBatcher(MinimalSplit(), batch_size=2, bucket_sizes=(16,), prefetch=0, native="on")
    batches = list(b)
    assert len(batches) == 2 and b.native_active is False


def test_compressed_int8_store_falls_back_correctly(tmp_path):
    """A user-made savez_COMPRESSED int8 store: resolve_payload_q8 must
    return None (deflated members can't be pread raw) and the batcher's
    numpy fallback must still produce the right int8-wire batch."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.native_bags import resolve_payload_q8
    from toad_tpu.ops.quantize import quantize_rows_np

    rng = np.random.RandomState(13)
    feats = rng.randn(9, 8).astype(np.float32)
    xq, scales = quantize_rows_np(feats)
    p = tmp_path / "c.npz"
    np.savez_compressed(p, features_int8=xq, scales=scales)
    assert resolve_payload_q8(p) is None

    class OneBag:
        labels = np.zeros(1, np.int32)
        sites = np.zeros(1, np.int32)
        sexes = np.zeros(1, np.int32)

        def __len__(self):
            return 1

        def bag_file(self, i):
            return p

        def load_bag(self, i):
            from toad_tpu.data.bags import load_bag

            return load_bag(p)

        def class_weights(self):
            return np.ones(1)

    b = BagBatcher(OneBag(), batch_size=1, bucket_sizes=(16,), prefetch=0,
                   transfer_dtype="int8", native="auto")
    batch = next(iter(b))
    assert b.native_active is False  # compressed member -> ineligible
    np.testing.assert_array_equal(np.asarray(batch.features[0, :9]), xq)
    np.testing.assert_array_equal(batch.scales[0, :9], scales)
