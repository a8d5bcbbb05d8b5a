"""Zero-copy bag payload resolution for the native loader.

Maps a bag file to the (byte offset, rows, dim) of its contiguous float32
payload so :func:`toad_tpu.native.pack_bags` can pread it straight into a
padded batch buffer — no Python-side array materialization, no GIL.

Eligible formats (anything else returns None and the caller falls back to
the numpy loader):
- ``.npy``   v1/v2/v3, dtype ``<f4``, C-order;
- ``.pt``    torch-zip with an uncompressed float32 storage (torch always
             stores tensor payloads uncompressed), contiguous layout, zero
             storage offset — the reference's bag format
             (``dataset_mtl_concat.py:370-371``);
- ``.h5``    ``features`` dataset that is contiguous (not chunked/compressed)
             float32.

A second payoff beyond the copy-free read: bag *lengths* come from metadata
alone, so bucket assignment never has to touch payload bytes.
"""

from __future__ import annotations

import ast
import os
import struct
from dataclasses import dataclass
from pathlib import Path


@dataclass(frozen=True)
class PayloadInfo:
    path: str
    offset: int  # byte offset of the float32 payload
    nrows: int
    dim: int


@dataclass(frozen=True)
class SegmentedPayload:
    """A multi-file bag's payloads in concatenation order (patient-concat
    bags: one slide file per segment, ``wsi_dataset.py::PatientBagSplit``).
    ``nrows`` is the total; the batcher packs each part at its cumulative
    row offset via the ``pack_segs*`` entry points."""

    parts: tuple  # PayloadInfo | Q8PayloadInfo per file
    nrows: int
    dim: int


@dataclass(frozen=True)
class Q8PayloadInfo:
    """An int8 bag store's raw payloads (``data/bags.py::save_int8_bag``):
    the quantized rows and their per-row f32 scales pread straight onto the
    int8 wire — no host dequantize/requantize round-trip."""

    path: str
    offset: int  # byte offset of the int8 [nrows, dim] payload
    scales_offset: int  # byte offset of the f32 [nrows] scales payload
    nrows: int
    dim: int


def _npy_member_payload(f, header_offset: int):
    """(descr, shape, data_offset) of an UNCOMPRESSED npy zip member, reading
    the LOCAL file header (central-directory extra length can differ) then
    the npy header. Returns None if stored-compression or parse assumptions
    fail."""
    f.seek(header_offset)
    lh = f.read(30)
    if len(lh) != 30 or lh[:4] != b"PK\x03\x04":
        return None
    method = struct.unpack("<H", lh[8:10])[0]
    if method != 0:  # ZIP_STORED only — np.savez never compresses
        return None
    name_len = struct.unpack("<H", lh[26:28])[0]
    extra_len = struct.unpack("<H", lh[28:30])[0]
    data_offset = header_offset + 30 + name_len + extra_len
    f.seek(data_offset)
    if f.read(6) != b"\x93NUMPY":
        return None
    major = f.read(1)[0]
    f.read(1)
    if major == 1:
        (hlen,) = struct.unpack("<H", f.read(2))
    else:
        (hlen,) = struct.unpack("<I", f.read(4))
    header = f.read(hlen).decode("latin1")
    payload_offset = f.tell()
    try:
        meta = ast.literal_eval(header)
    except (ValueError, SyntaxError):
        return None
    if meta.get("fortran_order"):
        return None
    return meta.get("descr"), tuple(meta.get("shape", ())), payload_offset


def resolve_payload_q8(path: str | os.PathLike) -> Q8PayloadInfo | None:
    """Q8PayloadInfo for an int8 bag (.npz with ``features_int8`` int8
    [N, D] + ``scales`` f32 [N]), or None when the file isn't one / isn't
    laid out for a raw pread (caller falls back to the numpy loader, which
    dequantizes transparently)."""
    path = Path(path)
    try:
        if path.suffix.lower() != ".npz":
            return None
        import zipfile

        with open(path, "rb") as f:
            with zipfile.ZipFile(f) as zf:
                infos = {i.filename: i.header_offset for i in zf.infolist()}
            if "features_int8.npy" not in infos or "scales.npy" not in infos:
                return None
            q = _npy_member_payload(f, infos["features_int8.npy"])
            s = _npy_member_payload(f, infos["scales.npy"])
        if q is None or s is None:
            return None
        q_descr, q_shape, q_off = q
        s_descr, s_shape, s_off = s
        if q_descr != "|i1" or len(q_shape) != 2:
            return None
        if s_descr != "<f4" or s_shape != (q_shape[0],):
            return None
        return Q8PayloadInfo(str(path), q_off, s_off, int(q_shape[0]), int(q_shape[1]))
    except Exception:
        return None


def _resolve_npy(path: Path) -> PayloadInfo | None:
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            return None
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            (hlen,) = struct.unpack("<H", f.read(2))
        else:
            (hlen,) = struct.unpack("<I", f.read(4))
        header = f.read(hlen).decode("latin1")
        offset = f.tell()
    try:
        meta = ast.literal_eval(header)
    except (ValueError, SyntaxError):
        return None
    if meta.get("descr") != "<f4" or meta.get("fortran_order"):
        return None
    shape = meta.get("shape", ())
    if len(shape) != 2:
        return None
    return PayloadInfo(str(path), offset, int(shape[0]), int(shape[1]))


def _resolve_pt(path: Path) -> PayloadInfo | None:
    import numpy as np

    from toad_tpu.data.torch_io import _MetaTensor, load_pt_meta, zip_member_payload

    try:
        obj, prefix = load_pt_meta(path)
    except Exception:
        return None
    tensor = None
    if isinstance(obj, _MetaTensor):
        tensor = obj
    elif isinstance(obj, dict):
        for key in ("features", "feats", "x"):
            if isinstance(obj.get(key), _MetaTensor):
                tensor = obj[key]
                break
    if tensor is None:
        return None
    if (
        tensor.storage.dtype != np.dtype(np.float32)
        or tensor.storage_offset != 0
        or not tensor.contiguous
        or len(tensor.shape) != 2
    ):
        return None
    member = f"{prefix}data/{tensor.storage.key}"
    payload = zip_member_payload(path, member)
    if payload is None:
        return None
    offset, size = payload
    if size < tensor.shape[0] * tensor.shape[1] * 4:
        return None
    return PayloadInfo(str(path), offset, tensor.shape[0], tensor.shape[1])


def _resolve_h5(path: Path) -> PayloadInfo | None:
    import h5py
    import numpy as np

    try:
        with h5py.File(path, "r") as f:
            if "features" not in f:
                return None
            ds = f["features"]
            if ds.dtype != np.dtype("<f4") or ds.chunks is not None or ds.compression is not None:
                return None
            if len(ds.shape) != 2:
                return None
            offset = ds.id.get_offset()
            if offset is None:
                return None
            return PayloadInfo(str(path), int(offset), int(ds.shape[0]), int(ds.shape[1]))
    except OSError:
        return None


def resolve_payload(path: str | os.PathLike) -> PayloadInfo | None:
    """PayloadInfo for a bag file, or None when the native fast path does
    not apply (caller falls back to the numpy loader)."""
    path = Path(path)
    try:
        ext = path.suffix.lower()
        if ext == ".npy":
            return _resolve_npy(path)
        if ext == ".pt":
            return _resolve_pt(path)
        if ext == ".h5":
            return _resolve_h5(path)
    except Exception:
        # any unparseable/truncated file is simply ineligible — the numpy
        # loader then raises the loud, descriptive error
        return None
    return None
