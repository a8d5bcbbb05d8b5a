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


def test_int8_bag_roundtrip(tmp_path):
    """save_int8_bag -> load_bag dequantizes within half an LSB per row;
    load_bag_quantized returns the exact stored payload + coords."""
    from toad_tpu.data.bags import load_bag_quantized, save_int8_bag

    rng = np.random.RandomState(0)
    feats = (rng.randn(60, 32) * rng.rand(60, 1) * 5).astype(np.float32)
    feats[13] = 0.0  # zero row stays exact
    coords = rng.randint(0, 10_000, (60, 2))
    p = tmp_path / "slide.npz"
    save_int8_bag(p, feats, coords)

    out, c = load_bag(p, with_coords=True)
    per_row_lsb = np.abs(feats).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(out - feats) <= per_row_lsb * 0.5 + 1e-7)
    np.testing.assert_array_equal(c, coords)

    xq, sx, c2 = load_bag_quantized(p)
    assert xq.dtype == np.int8 and sx.dtype == np.float32
    np.testing.assert_array_equal(c2, coords)
    # dequant -> requant is exact (each row's max maps back to ±127)
    from toad_tpu.ops.quantize import quantize_rows_np

    xq2, sx2 = quantize_rows_np(out)
    np.testing.assert_array_equal(xq, xq2)
    np.testing.assert_allclose(sx, sx2, rtol=1e-6)


def test_load_bag_quantized_rejects_non_int8(tmp_path):
    from toad_tpu.data.bags import load_bag_quantized

    np.savez(tmp_path / "plain.npz", features=np.zeros((4, 8), np.float32))
    assert load_bag_quantized(tmp_path / "plain.npz") is None
    np.save(tmp_path / "arr.npy", np.zeros((4, 8), np.float32))
    assert load_bag_quantized(tmp_path / "arr.npy") is None


def test_int8_bag_feeds_inference_passthrough(tmp_path):
    """infer_feature_bag on an int8-stored bag (int8 inference) gives the
    SAME prediction as the f32-stored bag through the int8 path — the
    passthrough skips host requantization but not precision."""
    import jax

    from toad_tpu.config import ModelConfig
    from toad_tpu.data.bags import save_int8_bag
    from toad_tpu.models.toad_mil import ToadMIL
    from toad_tpu.pipeline.featurize import write_bag
    from toad_tpu.pipeline.infer import SlideInference, infer_feature_bag

    cfg = ModelConfig(in_dim=64, n_classes=4)
    params = ToadMIL(cfg).init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    feats = rng.randn(150, 64).astype(np.float32)
    f32_p = tmp_path / "s_f32.npz"
    i8_p = tmp_path / "s_i8.npz"
    write_bag(f32_p, feats)
    write_bag(i8_p, feats, int8=True)
    assert i8_p.stat().st_size < f32_p.stat().st_size / 3  # ~4x smaller

    inf = SlideInference(params, cfg, bucket_sizes=(256,), int8=True)
    pred_i8, _ = infer_feature_bag(inf, i8_p, sex=1)
    pred_f32, _ = infer_feature_bag(inf, f32_p, sex=1)
    np.testing.assert_allclose(pred_i8.y_prob, pred_f32.y_prob, atol=1e-6)
    assert pred_i8.y_hat == pred_f32.y_hat
    # and the f32 engine consumes the int8 store transparently
    inf_f = SlideInference(params, cfg, bucket_sizes=(256,))
    pred_t, _ = infer_feature_bag(inf_f, i8_p, sex=1)
    np.testing.assert_allclose(pred_t.y_prob, pred_f32.y_prob, atol=0.02)
