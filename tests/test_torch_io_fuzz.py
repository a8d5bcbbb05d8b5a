"""torch_io round-trip fuzz: many dtypes/shapes/nestings through the native
writer and reader, plus real-torch cross-checks for every supported dtype."""

import numpy as np
import pytest

from toad_tpu.data.torch_io import flatten_state_dict, load_torch_pickle, save_torch_pickle

DTYPES = [np.float32, np.float64, np.float16, np.int64, np.int32, np.int16, np.int8, np.uint8, np.bool_]


@pytest.mark.parametrize("dtype", DTYPES)
def test_roundtrip_every_dtype(tmp_path, dtype):
    rng = np.random.RandomState(0)
    if dtype == np.bool_:
        arr = rng.rand(5, 7) > 0.5
    elif np.issubdtype(dtype, np.floating):
        arr = rng.randn(5, 7).astype(dtype)
    else:
        arr = rng.randint(0, 100, (5, 7)).astype(dtype)
    p = tmp_path / "x.pt"
    save_torch_pickle(p, {"a": arr})
    back = load_torch_pickle(p)
    assert back["a"].dtype == arr.dtype
    np.testing.assert_array_equal(back["a"], arr)


@pytest.mark.parametrize("dtype", DTYPES)
def test_torch_reads_our_files(tmp_path, dtype):
    torch = pytest.importorskip("torch")
    arr = (np.arange(12).reshape(3, 4) % 2).astype(dtype)
    p = tmp_path / "x.pt"
    save_torch_pickle(p, {"a": arr})
    t = torch.load(p, map_location="cpu", weights_only=False)["a"]
    np.testing.assert_array_equal(t.numpy(), arr)


def test_roundtrip_shapes_and_nesting(tmp_path):
    rng = np.random.RandomState(1)
    obj = {
        "scalar0d": np.float32(3.5) * np.ones((), np.float32),
        "vec": rng.randn(17).astype(np.float32),
        "deep": {"a": {"b": {"c": rng.randn(2, 3, 4, 5).astype(np.float32)}}},
        "list": [rng.randn(3).astype(np.float32), rng.randn(4).astype(np.float32)],
        "tuple": (np.int64(7) * np.ones((), np.int64),),
        "meta": {"name": "x", "count": 42, "flag": True, "none": None},
        "empty": np.zeros((0, 8), np.float32),
    }
    p = tmp_path / "n.pt"
    save_torch_pickle(p, obj)
    back = load_torch_pickle(p)
    np.testing.assert_array_equal(back["deep"]["a"]["b"]["c"], obj["deep"]["a"]["b"]["c"])
    np.testing.assert_array_equal(back["list"][1], obj["list"][1])
    assert back["meta"] == obj["meta"]
    assert back["empty"].shape == (0, 8)
    assert float(back["scalar0d"]) == 3.5


def test_noncontiguous_input_handled(tmp_path):
    rng = np.random.RandomState(2)
    base = rng.randn(10, 10).astype(np.float32)
    views = {"T": base.T, "stride": base[::2, ::3], "rev": base[::-1]}
    p = tmp_path / "v.pt"
    save_torch_pickle(p, views)
    back = load_torch_pickle(p)
    for k, v in views.items():
        np.testing.assert_array_equal(back[k], v)


def test_torch_saved_views_parse(tmp_path):
    """torch.save of non-contiguous tensors (nonzero storage offsets /
    strides) must parse correctly through the native reader."""
    torch = pytest.importorskip("torch")
    base = torch.arange(100, dtype=torch.float32).reshape(10, 10)
    obj = {"t": base.t(), "slice": base[3:7, 2:9], "narrow": base.narrow(0, 2, 5)}
    p = tmp_path / "tv.pt"
    torch.save(obj, p)
    back = load_torch_pickle(p)
    for k in obj:
        np.testing.assert_array_equal(back[k], obj[k].numpy())


def test_flatten_state_dict():
    tree = {"a": {"b": np.zeros(2), "c": np.ones(3)}, "d": np.full(1, 7.0)}
    flat = flatten_state_dict(tree)
    assert set(flat) == {"a.b", "a.c", "d"}
    np.testing.assert_array_equal(flat["a.c"], np.ones(3))


def test_unsupported_dtype_raises(tmp_path):
    with pytest.raises(ValueError, match="storage mapping"):
        save_torch_pickle(tmp_path / "bad.pt", {"x": np.zeros(3, np.complex64)})
