"""Native (C++) runtime components, bound via ctypes.

The library is compiled on first use with the system toolchain and cached
next to the source (or in a per-user cache dir when the package is not
writable). Everything here degrades gracefully: if no compiler is available
the callers fall back to the pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "bagio.cpp"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_FAILED: str | None = None


def _cache_path() -> Path:
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    pkg_dir = _SRC.parent
    for base in (pkg_dir, Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")) / "toad_tpu"):
        try:
            base.mkdir(parents=True, exist_ok=True)
            probe = base / ".writable"
            probe.touch()
            probe.unlink()
            return base / f"_bagio_{tag}.so"
        except OSError:
            continue
    return Path(tempfile.gettempdir()) / f"toad_bagio_{tag}.so"


def _compile(out: Path) -> None:
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-shared",
        "-fPIC",
        "-pthread",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(out),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    if proc.returncode != 0:
        raise RuntimeError(f"bagio compile failed: {proc.stderr.strip()[:500]}")


def get_lib() -> ctypes.CDLL | None:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED is not None:
            return _LIB
        try:
            so = _cache_path()
            if not so.exists():
                tmp = so.with_suffix(f".{os.getpid()}.tmp")
                _compile(tmp)
                os.replace(tmp, so)  # atomic wrt concurrent builders
            lib = ctypes.CDLL(str(so))
            lib.toad_bagio_abi_version.restype = ctypes.c_int32
            if lib.toad_bagio_abi_version() != 4:
                raise RuntimeError("bagio ABI mismatch")
            _common = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            _tail = [ctypes.c_int64, ctypes.c_int32]
            lib.toad_pack_bags.restype = ctypes.c_int64
            lib.toad_pack_bags.argtypes = _common + [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            lib.toad_pack_bags_bf16.restype = ctypes.c_int64
            lib.toad_pack_bags_bf16.argtypes = _common + [
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            lib.toad_pack_bags_int8.restype = ctypes.c_int64
            lib.toad_pack_bags_int8.argtypes = _common + [
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            lib.toad_pack_bags_q8.restype = ctypes.c_int64
            # (paths, q_offsets, s_offsets, nrows, dim, bucket, ...)
            lib.toad_pack_bags_q8.argtypes = _common[:3] + [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            # segment-granular entries (multi-file bags, e.g. patient-concat):
            # (paths, offsets, nrows, dst_rows, dim, <outputs>, nseg, nthreads)
            _seg_common = _common[:3] + [ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.toad_pack_segs.restype = ctypes.c_int64
            lib.toad_pack_segs.argtypes = _seg_common + [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            lib.toad_pack_segs_bf16.restype = ctypes.c_int64
            lib.toad_pack_segs_bf16.argtypes = _seg_common + [
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            lib.toad_pack_segs_int8.restype = ctypes.c_int64
            lib.toad_pack_segs_int8.argtypes = _seg_common + [
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            # (paths, q_offsets, s_offsets, nrows, dst_rows, dim, ...)
            lib.toad_pack_segs_q8.restype = ctypes.c_int64
            lib.toad_pack_segs_q8.argtypes = _common[:3] + [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ] + _tail
            _LIB = lib
        except (OSError, RuntimeError, subprocess.TimeoutExpired) as e:
            _FAILED = str(e)
        return _LIB


def available() -> bool:
    return get_lib() is not None


def failure_reason() -> str | None:
    get_lib()
    return _FAILED


def _check_buf(name: str, buf: np.ndarray, shape: tuple, dtype) -> None:
    # real checks, not asserts: these guard raw-pointer C writes and must
    # survive python -O (a stripped assert here means memory corruption)
    if buf.shape != shape or buf.dtype != dtype or not buf.flags.c_contiguous:
        raise ValueError(
            f"{name} must be C-contiguous {np.dtype(dtype).name} {shape}, got "
            f"{buf.dtype} {buf.shape} contiguous={buf.flags.c_contiguous}"
        )


def _pack_common(paths, offsets, nrows, dim, bucket):
    """Validate + marshal the shared (paths, offsets, nrows) arguments."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native bagio unavailable: {_FAILED}")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    offsets = np.ascontiguousarray(offsets, np.int64)
    nrows = np.ascontiguousarray(nrows, np.int64)
    if offsets.shape != (n,) or nrows.shape != (n,):
        raise ValueError(f"offsets/nrows must be length {n}, got {offsets.shape}/{nrows.shape}")
    if n and (int(nrows.min()) < 0 or int(nrows.max()) > bucket):
        raise ValueError(
            f"nrows must lie in [0, bucket={bucket}] (row {int(np.argmax(nrows))} has "
            f"{int(nrows.max())}): an oversized row count would overrun the next bag's slice"
        )
    if n and int(offsets.min()) < 0:
        raise ValueError("offsets must be non-negative file positions")
    return lib, n, c_paths, offsets, nrows


def _raise_on_rc(rc: int, paths, offsets, nrows) -> None:
    if rc != 0:
        j = int(rc) - 1
        raise IOError(f"native bag read failed for {paths[j]} (offset {int(offsets[j])}, rows {int(nrows[j])})")


def _p(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_bags(
    paths: list[str],
    offsets: np.ndarray,
    nrows: np.ndarray,
    dim: int,
    bucket: int,
    out: np.ndarray,
    mask: np.ndarray,
    nthreads: int = 0,
) -> None:
    """Parallel-read bag payloads into `out` [B, bucket, dim] (zeroed by the
    caller) and set `mask` rows. Raises on any read failure."""
    lib, n, c_paths, offsets, nrows = _pack_common(paths, offsets, nrows, dim, bucket)
    _check_buf("out", out, (n, bucket, dim), np.float32)
    _check_buf("mask", mask, (n, bucket), np.float32)
    rc = lib.toad_pack_bags(
        c_paths, _p(offsets, ctypes.c_int64), _p(nrows, ctypes.c_int64), dim, bucket,
        _p(out, ctypes.c_float), _p(mask, ctypes.c_float), n, nthreads,
    )
    _raise_on_rc(rc, paths, offsets, nrows)


def pack_bags_bf16(
    paths: list[str],
    offsets: np.ndarray,
    nrows: np.ndarray,
    dim: int,
    bucket: int,
    out: np.ndarray,
    mask: np.ndarray,
    nthreads: int = 0,
) -> None:
    """Fused read + f32->bf16 cast: `out` is a caller-zeroed [B, bucket, dim]
    uint16 view of a bf16 buffer (``arr.view(np.uint16)``). One pass on the
    host instead of pack + numpy astype."""
    lib, n, c_paths, offsets, nrows = _pack_common(paths, offsets, nrows, dim, bucket)
    _check_buf("out", out, (n, bucket, dim), np.uint16)
    _check_buf("mask", mask, (n, bucket), np.float32)
    rc = lib.toad_pack_bags_bf16(
        c_paths, _p(offsets, ctypes.c_int64), _p(nrows, ctypes.c_int64), dim, bucket,
        _p(out, ctypes.c_uint16), _p(mask, ctypes.c_float), n, nthreads,
    )
    _raise_on_rc(rc, paths, offsets, nrows)


def pack_bags_int8(
    paths: list[str],
    offsets: np.ndarray,
    nrows: np.ndarray,
    dim: int,
    bucket: int,
    out_q: np.ndarray,
    scales: np.ndarray,
    mask: np.ndarray,
    nthreads: int = 0,
) -> None:
    """Fused read + per-row dynamic int8 quantization (the exact twin of
    ``ops/quantize.py::quantize_rows_np``): `out_q` caller-zeroed int8
    [B, bucket, dim], `scales` [B, bucket] f32 caller-prefilled with a
    positive value (padding rows keep it — q=0 is exact under any scale)."""
    lib, n, c_paths, offsets, nrows = _pack_common(paths, offsets, nrows, dim, bucket)
    _check_buf("out_q", out_q, (n, bucket, dim), np.int8)
    _check_buf("scales", scales, (n, bucket), np.float32)
    _check_buf("mask", mask, (n, bucket), np.float32)
    rc = lib.toad_pack_bags_int8(
        c_paths, _p(offsets, ctypes.c_int64), _p(nrows, ctypes.c_int64), dim, bucket,
        _p(out_q, ctypes.c_int8), _p(scales, ctypes.c_float), _p(mask, ctypes.c_float), n, nthreads,
    )
    _raise_on_rc(rc, paths, offsets, nrows)


def pack_bags_q8(
    paths: list[str],
    q_offsets: np.ndarray,
    s_offsets: np.ndarray,
    nrows: np.ndarray,
    dim: int,
    bucket: int,
    out_q: np.ndarray,
    scales: np.ndarray,
    mask: np.ndarray,
    nthreads: int = 0,
) -> None:
    """Read-through for int8 bag STORES (``data/bags.py::save_int8_bag``):
    preads the on-disk int8 rows and f32 per-row scales straight into the
    wire buffers — no dequantize/requantize round-trip. Buffer contracts as
    ``pack_bags_int8``; `q_offsets`/`s_offsets` locate the two payloads
    (``data/native_bags.py::resolve_payload_q8``)."""
    lib, n, c_paths, q_offsets, nrows = _pack_common(paths, q_offsets, nrows, dim, bucket)
    s_offsets = np.ascontiguousarray(s_offsets, np.int64)
    if s_offsets.shape != (n,):
        raise ValueError(f"s_offsets must be shape {(n,)}, got {s_offsets.shape}")
    if n and int(s_offsets.min()) < 0:
        raise ValueError("s_offsets must be non-negative file positions")
    _check_buf("out_q", out_q, (n, bucket, dim), np.int8)
    _check_buf("scales", scales, (n, bucket), np.float32)
    _check_buf("mask", mask, (n, bucket), np.float32)
    rc = lib.toad_pack_bags_q8(
        c_paths, _p(q_offsets, ctypes.c_int64), _p(s_offsets, ctypes.c_int64),
        _p(nrows, ctypes.c_int64), dim, bucket,
        _p(out_q, ctypes.c_int8), _p(scales, ctypes.c_float), _p(mask, ctypes.c_float), n, nthreads,
    )
    _raise_on_rc(rc, paths, q_offsets, nrows)


def _check_dst_rows(dst_rows, nrows: np.ndarray, n: int, b: int, bucket: int) -> np.ndarray:
    """Validate segment destination rows against the [b, bucket] batch
    geometry: every segment must land inside ONE bag slot (row_start +
    nrows <= bucket) and inside the buffer. Guards raw C writes."""
    dst_rows = np.ascontiguousarray(dst_rows, np.int64)
    if dst_rows.shape != (n,):
        raise ValueError(f"dst_rows must be shape {(n,)}, got {dst_rows.shape}")
    if n == 0:
        return dst_rows
    if int(dst_rows.min()) < 0:
        raise ValueError("dst_rows must be non-negative")
    row_in_bag = dst_rows % bucket
    if int((row_in_bag + nrows).max()) > bucket:
        raise ValueError("a segment crosses its bag slot (row_start + nrows > bucket)")
    if int((dst_rows + nrows).max()) > b * bucket:
        raise ValueError("a segment lands past the end of the batch buffer")
    return dst_rows


def pack_segs(paths, offsets, nrows, dst_rows, dim, out, mask, nthreads=0) -> None:
    """Segment-granular :func:`pack_bags`: entry j preads into flattened row
    ``dst_rows[j]`` of the [B, bucket, dim] buffer. Multi-file bags
    (patient-concat: one slide file per segment) pass one entry per file
    with cumulative row starts; the mask rows set are the union."""
    b, bucket = mask.shape if mask.ndim == 2 else (0, 0)
    lib, n, c_paths, offsets, nrows = _pack_common(paths, offsets, nrows, dim, bucket)
    _check_buf("out", out, (b, bucket, dim), np.float32)
    _check_buf("mask", mask, (b, bucket), np.float32)
    dst_rows = _check_dst_rows(dst_rows, nrows, n, b, bucket)
    rc = lib.toad_pack_segs(
        c_paths, _p(offsets, ctypes.c_int64), _p(nrows, ctypes.c_int64),
        _p(dst_rows, ctypes.c_int64), dim,
        _p(out, ctypes.c_float), _p(mask, ctypes.c_float), n, nthreads,
    )
    _raise_on_rc(rc, paths, offsets, nrows)


def pack_segs_bf16(paths, offsets, nrows, dst_rows, dim, out, mask, nthreads=0) -> None:
    """Segment-granular :func:`pack_bags_bf16` (out = uint16 view of bf16)."""
    b, bucket = mask.shape if mask.ndim == 2 else (0, 0)
    lib, n, c_paths, offsets, nrows = _pack_common(paths, offsets, nrows, dim, bucket)
    _check_buf("out", out, (b, bucket, dim), np.uint16)
    _check_buf("mask", mask, (b, bucket), np.float32)
    dst_rows = _check_dst_rows(dst_rows, nrows, n, b, bucket)
    rc = lib.toad_pack_segs_bf16(
        c_paths, _p(offsets, ctypes.c_int64), _p(nrows, ctypes.c_int64),
        _p(dst_rows, ctypes.c_int64), dim,
        _p(out, ctypes.c_uint16), _p(mask, ctypes.c_float), n, nthreads,
    )
    _raise_on_rc(rc, paths, offsets, nrows)


def pack_segs_int8(paths, offsets, nrows, dst_rows, dim, out_q, scales, mask, nthreads=0) -> None:
    """Segment-granular :func:`pack_bags_int8` (fused read + quantize).
    Per-row quantization is segment-oblivious, so a patient bag quantized
    segment-by-segment equals quantizing the concatenated bag."""
    b, bucket = mask.shape if mask.ndim == 2 else (0, 0)
    lib, n, c_paths, offsets, nrows = _pack_common(paths, offsets, nrows, dim, bucket)
    _check_buf("out_q", out_q, (b, bucket, dim), np.int8)
    _check_buf("scales", scales, (b, bucket), np.float32)
    _check_buf("mask", mask, (b, bucket), np.float32)
    dst_rows = _check_dst_rows(dst_rows, nrows, n, b, bucket)
    rc = lib.toad_pack_segs_int8(
        c_paths, _p(offsets, ctypes.c_int64), _p(nrows, ctypes.c_int64),
        _p(dst_rows, ctypes.c_int64), dim,
        _p(out_q, ctypes.c_int8), _p(scales, ctypes.c_float), _p(mask, ctypes.c_float),
        n, nthreads,
    )
    _raise_on_rc(rc, paths, offsets, nrows)


def pack_segs_q8(paths, q_offsets, s_offsets, nrows, dst_rows, dim, out_q, scales, mask,
                 nthreads=0) -> None:
    """Segment-granular :func:`pack_bags_q8` (int8-store read-through)."""
    b, bucket = mask.shape if mask.ndim == 2 else (0, 0)
    lib, n, c_paths, q_offsets, nrows = _pack_common(paths, q_offsets, nrows, dim, bucket)
    s_offsets = np.ascontiguousarray(s_offsets, np.int64)
    if s_offsets.shape != (n,):
        raise ValueError(f"s_offsets must be shape {(n,)}, got {s_offsets.shape}")
    if n and int(s_offsets.min()) < 0:
        raise ValueError("s_offsets must be non-negative file positions")
    _check_buf("out_q", out_q, (b, bucket, dim), np.int8)
    _check_buf("scales", scales, (b, bucket), np.float32)
    _check_buf("mask", mask, (b, bucket), np.float32)
    dst_rows = _check_dst_rows(dst_rows, nrows, n, b, bucket)
    rc = lib.toad_pack_segs_q8(
        c_paths, _p(q_offsets, ctypes.c_int64), _p(s_offsets, ctypes.c_int64),
        _p(nrows, ctypes.c_int64), _p(dst_rows, ctypes.c_int64), dim,
        _p(out_q, ctypes.c_int8), _p(scales, ctypes.c_float), _p(mask, ctypes.c_float),
        n, nthreads,
    )
    _raise_on_rc(rc, paths, q_offsets, nrows)
