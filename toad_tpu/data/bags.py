"""Feature-bag readers: ``.pt`` (torch zip serialization, parsed natively),
``.h5`` (``features`` + ``coords``), ``.npy``/``.npz``.

The reference loads bags with ``torch.load`` inside DataLoader workers
(``datasets/dataset_mtl_concat.py:369-373``) and h5py (``:377-383``). This
module keeps the same on-disk contracts but reads them into numpy without a
torch dependency: the torch "zip" format is a zipfile holding a pickle
(``data.pkl``) whose storages are persistent-id references to raw little-endian
buffers stored as ``<prefix>/data/<key>`` members — small enough to parse
directly, which also lets bag IO run in plain threads (no worker processes).
"""

from __future__ import annotations

import io
import os
import pickle
import zipfile
from pathlib import Path

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax

    return np.dtype(ml_dtypes.bfloat16)


def _storage_dtype(storage_type) -> np.dtype:
    # storage_type is a class (torch.FloatStorage) or a dtype-carrying
    # TypedStorage stub; match by name.
    name = getattr(storage_type, "__name__", str(storage_type))
    if name in _STORAGE_DTYPES:
        return np.dtype(_STORAGE_DTYPES[name])
    if "BFloat16" in name:
        return _bfloat16_dtype()
    raise ValueError(f"unsupported torch storage type: {name}")


class _Stub:
    """Placeholder for torch classes we don't need to materialize."""

    def __init__(self, *a, **k):
        pass


class _StorageRef:
    def __init__(self, data: np.ndarray):
        self.data = data


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride, *unused):
    flat = storage.data
    if len(size) == 0:
        return flat[storage_offset].copy()
    itemsize = flat.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = _storage_dtype(storage_type)
        member = f"{self._prefix}data/{key}"
        raw = self._zf.read(member)
        arr = np.frombuffer(raw, dtype=dtype, count=numel)
        return _StorageRef(arr)

    def find_class(self, module, name):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name.endswith("Storage"):
            return type(name, (_Stub,), {"__name__": name})
        if module == "torch" and name == "Size":
            return tuple
        if module.startswith("torch"):
            return type(name, (_Stub,), {"__name__": name})
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "numpy.core.multiarray" and name == "_reconstruct":
            import numpy.core.multiarray as m

            return m._reconstruct
        if module == "numpy" and name in ("ndarray", "dtype"):
            return getattr(np, name)
        raise pickle.UnpicklingError(f"refusing to load {module}.{name}")


def load_pt_tensor(path: str | os.PathLike) -> np.ndarray:
    """Parse a torch-saved tensor (zip serialization format) into numpy.

    Handles the common case produced by ``torch.save(tensor, f)`` — the
    contract the reference relies on at ``dataset_mtl_concat.py:370-371``.
    Falls back to ``torch.load`` for exotic/legacy files if torch is present.
    """
    path = Path(path)
    try:
        with zipfile.ZipFile(path) as zf:
            pkl_members = [n for n in zf.namelist() if n.endswith("data.pkl")]
            if not pkl_members:
                raise pickle.UnpicklingError("no data.pkl in archive")
            pkl_name = pkl_members[0]
            prefix = pkl_name[: -len("data.pkl")]
            with zf.open(pkl_name) as f:
                obj = _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()
    except (zipfile.BadZipFile, pickle.UnpicklingError, ValueError):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise ValueError(f"cannot parse {path} and torch unavailable for fallback") from e
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "numpy"):
            return np.asarray(obj.float().numpy() if obj.dtype == torch.bfloat16 else obj.numpy())

    if isinstance(obj, np.ndarray):
        return obj
    if isinstance(obj, dict):
        for key in ("features", "feats", "x"):
            if key in obj:
                return np.asarray(obj[key])
        raise ValueError(f"{path}: dict payload without a 'features' entry (keys: {list(obj)})")
    return np.asarray(obj)


def load_h5_bag(path: str | os.PathLike, with_coords: bool = False):
    """Read ``features`` (+ optional ``coords``) from an h5 bag
    (reference ``dataset_mtl_concat.py:377-383``)."""
    import h5py

    with h5py.File(path, "r") as f:
        features = f["features"][:]
        coords = f["coords"][:] if (with_coords and "coords" in f) else None
    if with_coords:
        return np.asarray(features), coords
    return np.asarray(features)


def bag_path(data_dir: str | os.PathLike, slide_id: str, use_h5: bool = False) -> Path:
    """Resolve the on-disk bag file for a slide; prefers the requested format
    but falls back across {.pt,.h5,.npy,.npz} so converted stores just work."""
    d = Path(data_dir)
    preferred = ".h5" if use_h5 else ".pt"
    candidates = [preferred, ".pt", ".h5", ".npy", ".npz"]
    for ext in dict.fromkeys(candidates):
        p = d / f"{slide_id}{ext}"
        if p.exists():
            return p
    return d / f"{slide_id}{preferred}"  # let the open fail with a clear path


def load_bag(path: str | os.PathLike, with_coords: bool = False):
    """Load a feature bag [N, D] float array from any supported format."""
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".pt":
        feats = load_pt_tensor(path)
        return (feats, None) if with_coords else feats
    if ext == ".h5":
        return load_h5_bag(path, with_coords=with_coords)
    if ext == ".npy":
        feats = np.load(path)
        return (feats, None) if with_coords else feats
    if ext == ".npz":
        z = np.load(path)
        feats = z["features"] if "features" in z else z[z.files[0]]
        coords = z["coords"] if "coords" in z.files else None
        return (feats, coords) if with_coords else feats
    raise ValueError(f"unsupported bag format: {path}")
