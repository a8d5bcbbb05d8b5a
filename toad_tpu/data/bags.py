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

import os
from pathlib import Path

import numpy as np

from toad_tpu.data.torch_io import load_torch_pickle


def load_pt_tensor(path: str | os.PathLike) -> np.ndarray:
    """Parse a torch-saved tensor (zip serialization format) into numpy.

    Handles the common case produced by ``torch.save(tensor, f)`` — the
    contract the reference relies on at ``dataset_mtl_concat.py:370-371``.
    Falls back to ``torch.load`` for exotic/legacy files if torch is present.
    """
    import pickle
    import zipfile

    path = Path(path)
    try:
        obj = load_torch_pickle(path)
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


def _sidecar_coords(path: Path) -> np.ndarray | None:
    """Coords for formats that can't embed them (.pt tensor, .npy): a
    ``{stem}.coords.npy`` sibling written by the featurizer."""
    p = path.with_suffix(".coords.npy")
    return np.load(p) if p.exists() else None


def save_int8_bag(path: str | os.PathLike, features: np.ndarray, coords: np.ndarray | None = None) -> None:
    """Write a row-quantized int8 bag (.npz with ``features_int8`` [N, D]
    int8 + ``scales`` [N] f32 [+ ``coords``]) — 4x smaller than f32 on disk,
    and the int8 inference path consumes it without re-quantizing on the
    host (``load_bag_quantized``). Beyond-reference capability; quantization
    scheme: ``ops/quantize.py`` (dynamic per-row scales)."""
    from toad_tpu.ops.quantize import quantize_rows_np

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix.lower() != ".npz":
        raise ValueError(f"int8 bags are .npz files, got {path}")
    xq, scales = quantize_rows_np(np.asarray(features, np.float32))
    payload = {"features_int8": xq, "scales": scales}
    if coords is not None:
        payload["coords"] = coords
    np.savez(path, **payload)


def load_bag_quantized(path: str | os.PathLike):
    """(xq int8 [N, D], scales f32 [N], coords | None) from an int8 bag, or
    ``None`` if the file isn't one — callers fall back to ``load_bag`` +
    on-host quantization."""
    path = Path(path)
    if path.suffix.lower() != ".npz":
        return None
    z = np.load(path)
    if "features_int8" not in z.files:
        return None
    return z["features_int8"], z["scales"], (z["coords"] if "coords" in z.files else None)


def bag_shape(path: str | os.PathLike):
    """(n_patches, dim) from file metadata without reading the payload:
    .npy via mmap header, .h5 via dataset shape, .pt via the native
    resolver's metadata parse, .npz via zip member npy headers. Powers
    pre-flight validation (``cli/validate.py``) and the auto bucket ladder
    (``data/batching.py::auto_bucket_ladder``) at O(1) IO per bag."""
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".npy":
        return np.load(path, mmap_mode="r").shape
    if ext == ".h5":
        import h5py

        with h5py.File(path, "r") as f:
            return tuple(f["features"].shape)
    if ext == ".pt":
        from toad_tpu.data.native_bags import resolve_payload

        info = resolve_payload(path)
        if info is not None:
            return (info.nrows, info.dim)
        return load_pt_tensor(path).shape  # exotic layout: full parse
    if ext == ".npz":
        # member *header* read only — np.load(path)[key] would pull the whole
        # array payload through the zip layer, O(store size) for a pre-flight
        import zipfile

        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            member = next(
                (w for w in ("features_int8.npy", "features.npy") if w in names),
                names[0],
            )
            with zf.open(member) as fp:
                version = np.lib.format.read_magic(fp)
                read_header = {
                    (1, 0): np.lib.format.read_array_header_1_0,
                    (2, 0): np.lib.format.read_array_header_2_0,
                }[version]
                shape, _, _ = read_header(fp)
        return shape
    raise ValueError(f"unsupported bag format: {path}")


def load_bag(path: str | os.PathLike, with_coords: bool = False):
    """Load a feature bag [N, D] float array from any supported format.
    int8 bags (``save_int8_bag``) dequantize transparently so every f32
    consumer keeps working."""
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".pt":
        feats = load_pt_tensor(path)
        return (feats, _sidecar_coords(path)) if with_coords else feats
    if ext == ".h5":
        return load_h5_bag(path, with_coords=with_coords)
    if ext == ".npy":
        feats = np.load(path)
        return (feats, _sidecar_coords(path)) if with_coords else feats
    if ext == ".npz":
        z = np.load(path)
        if "features_int8" in z.files:
            feats = z["features_int8"].astype(np.float32) * z["scales"][:, None]
        else:
            feats = z["features"] if "features" in z else z[z.files[0]]
        coords = z["coords"] if "coords" in z.files else None
        return (feats, coords) if with_coords else feats
    raise ValueError(f"unsupported bag format: {path}")
