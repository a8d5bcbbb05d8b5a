"""Native reader/writer for the torch "zip" serialization format.

The reference ecosystem's on-disk currency is ``torch.save`` files: feature
bags (``datasets/dataset_mtl_concat.py:370-371``), model checkpoints
(``utils/core_utils_mtl_concat.py:84,151``), and torchvision weight files for
the patch encoder (``models/resnet_custom.py:121-124``). This module parses
and emits that format with zipfile+pickle+numpy only — no torch import on
any hot path — so the framework can ingest reference artifacts and export
reference-compatible checkpoints anywhere JAX runs.

Format: a zipfile with members ``<prefix>/data.pkl`` (a pickle whose tensors
are ``torch._utils._rebuild_tensor_v2`` calls over persistent-id storage
references) and ``<prefix>/data/<key>`` (raw little-endian storage buffers).
"""

from __future__ import annotations

import io
import os
import pickle
import sys
import types
import zipfile
from pathlib import Path
from typing import Any

import numpy as np


def _np_multiarray():
    """numpy's multiarray module without the numpy.core deprecation alias
    (numpy >= 2 moved it to numpy._core)."""
    try:
        from numpy._core import multiarray  # numpy >= 2
    except ImportError:  # pragma: no cover - numpy 1.x
        from numpy.core import multiarray
    return multiarray


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
_DTYPE_STORAGE = {np.dtype(v): k for k, v in _STORAGE_DTYPES.items()}


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax

    return np.dtype(ml_dtypes.bfloat16)


def _storage_dtype(storage_type) -> np.dtype:
    name = getattr(storage_type, "__name__", str(storage_type))
    if name in _STORAGE_DTYPES:
        return np.dtype(_STORAGE_DTYPES[name])
    if "BFloat16" in name:
        return _bfloat16_dtype()
    raise ValueError(f"unsupported torch storage type: {name}")


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------


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
        if module in ("numpy.core.multiarray", "numpy._core.multiarray") and name == "_reconstruct":
            # numpy 2 pickles reference numpy._core.*; numpy 1 used numpy.core.*
            return _np_multiarray()._reconstruct
        if module == "numpy" and name in ("ndarray", "dtype"):
            return getattr(np, name)
        if module.startswith("numpy") and name == "scalar":
            return _np_multiarray().scalar
        if module == "_codecs" and name == "encode":
            # numpy array pickles encode byte payloads through _codecs.encode
            import _codecs

            return _codecs.encode
        raise pickle.UnpicklingError(f"refusing to load {module}.{name}")


def load_torch_pickle(path: str | os.PathLike) -> Any:
    """Parse any ``torch.save``-d zip file (tensor, state_dict, nested dict)
    into numpy arrays / plain containers, without torch."""
    path = Path(path)
    with zipfile.ZipFile(path) as zf:
        pkl_members = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if not pkl_members:
            raise pickle.UnpicklingError(f"{path}: no data.pkl in archive")
        pkl_name = pkl_members[0]
        prefix = pkl_name[: -len("data.pkl")]
        with zf.open(pkl_name) as f:
            return _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()


# ---------------------------------------------------------------------------
# Metadata-only reading (no payload bytes touched) — powers the native
# zero-copy loader, which preads storage bytes straight into batch buffers.
# ---------------------------------------------------------------------------


class _MetaStorage:
    def __init__(self, key: str, dtype: np.dtype, numel: int):
        self.key = key
        self.dtype = dtype
        self.numel = numel


class _MetaTensor:
    def __init__(self, storage: _MetaStorage, storage_offset, size, stride):
        self.storage = storage
        self.storage_offset = int(storage_offset)
        self.shape = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride)

    @property
    def contiguous(self) -> bool:
        expect = 1
        for dim, st in zip(reversed(self.shape), reversed(self.stride)):
            if dim > 1 and st != expect:
                return False
            expect *= dim
        return True


class _MetaUnpickler(_TorchUnpickler):
    def __init__(self, file, prefix: str):
        pickle.Unpickler.__init__(self, file)
        self._prefix = prefix

    def persistent_load(self, pid):
        if pid[0] != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid[0]!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        return _MetaStorage(key, _storage_dtype(storage_type), int(numel))

    def find_class(self, module, name):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return lambda storage, off, size, stride, *unused: _MetaTensor(storage, off, size, stride)
        return super().find_class(module, name)


def load_pt_meta(path: str | os.PathLike):
    """Parse a torch-zip file's structure WITHOUT reading tensor payloads.
    Returns (obj, prefix) where tensors appear as :class:`_MetaTensor`."""
    path = Path(path)
    with zipfile.ZipFile(path) as zf:
        pkl_members = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if not pkl_members:
            raise pickle.UnpicklingError(f"{path}: no data.pkl in archive")
        pkl_name = pkl_members[0]
        prefix = pkl_name[: -len("data.pkl")]
        with zf.open(pkl_name) as f:
            return _MetaUnpickler(io.BytesIO(f.read()), prefix).load(), prefix


def zip_member_payload(path: str | os.PathLike, member: str) -> tuple[int, int] | None:
    """(absolute byte offset, size) of an uncompressed zip member's data, or
    None when the member is compressed (torch stores tensor payloads
    uncompressed, so .pt bags qualify)."""
    import struct

    with zipfile.ZipFile(path) as zf:
        zi = zf.getinfo(member)
        if zi.compress_type != zipfile.ZIP_STORED:
            return None
        header_offset = zi.header_offset
        size = zi.file_size
    with open(path, "rb") as f:
        f.seek(header_offset)
        hdr = f.read(30)
        if len(hdr) < 30 or hdr[:4] != b"PK\x03\x04":
            return None
        namelen, extralen = struct.unpack("<HH", hdr[26:30])
        return header_offset + 30 + namelen + extralen, size


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------


def _fake_torch_modules():
    """Register minimal fake ``torch`` / ``torch._utils`` modules so pickle's
    save_global name lookups succeed when torch isn't installed. Real torch,
    when present, is used as-is."""
    try:
        import torch  # noqa: F401

        import torch._utils  # noqa: F401

        return sys.modules["torch"], sys.modules["torch._utils"]
    except ImportError:
        pass
    torch_mod = sys.modules.get("torch")
    if torch_mod is None:
        torch_mod = types.ModuleType("torch")
        sys.modules["torch"] = torch_mod
    utils_mod = sys.modules.get("torch._utils")
    if utils_mod is None:
        utils_mod = types.ModuleType("torch._utils")
        sys.modules["torch._utils"] = utils_mod
        torch_mod._utils = utils_mod
    if not hasattr(utils_mod, "_rebuild_tensor_v2"):
        def _rebuild(*a):  # never called at write time
            raise RuntimeError("stub")

        _rebuild.__module__ = "torch._utils"
        _rebuild.__name__ = _rebuild.__qualname__ = "_rebuild_tensor_v2"
        utils_mod._rebuild_tensor_v2 = _rebuild
    for sname in _STORAGE_DTYPES:
        if not hasattr(torch_mod, sname):
            cls = type(sname, (), {"__module__": "torch", "__qualname__": sname})
            setattr(torch_mod, sname, cls)
    return torch_mod, utils_mod


class _TensorProxy:
    """Pickles exactly like a torch tensor: a ``_rebuild_tensor_v2`` call over
    a persistent-id storage reference."""

    def __init__(self, arr: np.ndarray, storage: "_StorageOut", rebuild_fn):
        self._arr = arr
        self._storage = storage
        self._rebuild = rebuild_fn

    def __reduce__(self):
        import collections

        arr = self._arr
        strides = tuple(s // arr.dtype.itemsize for s in arr.strides)
        return (
            self._rebuild,
            (self._storage, 0, tuple(arr.shape), strides, False, collections.OrderedDict()),
        )


class _StorageOut:
    def __init__(self, key: str, storage_cls, numel: int):
        self.key = key
        self.storage_cls = storage_cls
        self.numel = numel


class _TorchPickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _StorageOut):
            return ("storage", obj.storage_cls, obj.key, "cpu", obj.numel)
        return None


def save_torch_pickle(path: str | os.PathLike, obj: Any, prefix: str = "archive") -> None:
    """Write ``obj`` (nested dicts/lists of numpy arrays + scalars/strings) as
    a ``torch.load``-compatible zip file. Arrays become torch tensors."""
    torch_mod, utils_mod = _fake_torch_modules()
    rebuild_fn = utils_mod._rebuild_tensor_v2

    storages: list[tuple[str, bytes]] = []

    def convert(o: Any) -> Any:
        if isinstance(o, np.ndarray):
            arr = np.ascontiguousarray(o)
            dt = arr.dtype
            if dt not in _DTYPE_STORAGE:
                # torch has no unsigned storages beyond uint8 — widen losslessly
                widen = {np.dtype(np.uint16): np.int32, np.dtype(np.uint32): np.int64}
                if dt in widen:
                    arr = np.ascontiguousarray(arr.astype(widen[dt]))
                    dt = arr.dtype
                else:
                    raise ValueError(f"dtype {dt} has no torch storage mapping")
            key = str(len(storages))
            storages.append((key, arr.tobytes()))
            storage_cls = getattr(torch_mod, _DTYPE_STORAGE[dt])
            return _TensorProxy(arr, _StorageOut(key, storage_cls, arr.size), rebuild_fn)
        if isinstance(o, np.generic):
            return o.item()
        if isinstance(o, dict):
            import collections

            return collections.OrderedDict((k, convert(v)) for k, v in o.items())
        if isinstance(o, (list, tuple)):
            t = type(o)
            return t(convert(v) for v in o)
        return o

    converted = convert(obj)
    buf = io.BytesIO()
    _TorchPickler(buf, protocol=2).dump(converted)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{prefix}/data.pkl", buf.getvalue())
        for key, raw in storages:
            zf.writestr(f"{prefix}/data/{key}", raw)
        zf.writestr(f"{prefix}/version", "3\n")


def flatten_state_dict(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a nested params pytree into torch-style dotted names."""
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(flatten_state_dict(v, name))
            else:
                out[name] = np.asarray(v)
        return out
    raise TypeError("flatten_state_dict expects a dict at the top level")
