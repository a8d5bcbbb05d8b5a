"""Bag reader formats, including the torch-free .pt parser."""

import numpy as np
import pytest

from toad_tpu.data.bags import bag_path, load_bag, load_h5_bag, load_pt_tensor

torch = pytest.importorskip("torch")


def test_pt_parse_matches_torch(tmp_path):
    x = torch.randn(137, 64)
    p = tmp_path / "slide.pt"
    torch.save(x, p)
    got = load_pt_tensor(p)
    np.testing.assert_allclose(got, x.numpy(), rtol=0, atol=0)
    assert got.dtype == np.float32


def test_pt_parse_half_and_long(tmp_path):
    for t, dt in ((torch.randn(10, 8).half(), np.float16), ((torch.arange(24).reshape(4, 6)), np.int64)):
        p = tmp_path / "x.pt"
        torch.save(t, p)
        got = load_pt_tensor(p)
        assert got.dtype == dt
        np.testing.assert_array_equal(got, t.numpy())


def test_pt_noncontiguous(tmp_path):
    x = torch.randn(64, 32).t()  # transposed view, non-contiguous strides
    p = tmp_path / "t.pt"
    torch.save(x, p)
    np.testing.assert_allclose(load_pt_tensor(p), x.numpy())


def test_h5_roundtrip(tmp_path):
    import h5py

    feats = np.random.randn(50, 16).astype(np.float32)
    coords = np.random.randint(0, 1000, (50, 2))
    with h5py.File(tmp_path / "s.h5", "w") as f:
        f.create_dataset("features", data=feats)
        f.create_dataset("coords", data=coords)
    got, c = load_h5_bag(tmp_path / "s.h5", with_coords=True)
    np.testing.assert_array_equal(got, feats)
    np.testing.assert_array_equal(c, coords)


def test_npy_npz(tmp_path):
    feats = np.random.randn(20, 8).astype(np.float32)
    np.save(tmp_path / "a.npy", feats)
    np.testing.assert_array_equal(load_bag(tmp_path / "a.npy"), feats)
    np.savez(tmp_path / "b.npz", features=feats)
    np.testing.assert_array_equal(load_bag(tmp_path / "b.npz"), feats)


def test_bag_path_fallback(tmp_path):
    feats = np.random.randn(4, 4).astype(np.float32)
    np.save(tmp_path / "sl.npy", feats)
    # asked for .pt, falls back to existing .npy
    p = bag_path(tmp_path, "sl", use_h5=False)
    assert p.suffix == ".npy"
