"""Patch featurization: tile images -> 1024-d feature bags, on device.

This is the stage the reference delegates to the sibling CLAM repo
(``docs/README.md:39``) while vendoring only the encoder definition
(``models/resnet_custom.py``). Here it is part of the framework: a CLAM-style
patch file (h5 with ``imgs`` [N,H,W,3] uint8 + ``coords`` [N,2]) streams
through the jitted ResNet encoder in fixed-size batches (one compiled
program), and the resulting bag is written in any supported format.

Throughput notes: batches are padded to a single static shape so XLA compiles
once; dispatch is async, so host-side h5 reads of batch i+1 overlap device
compute of batch i; convs run in bf16 on the MXU with BN folded
(:mod:`toad_tpu.models.resnet_encoder`).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from toad_tpu.config import EncoderConfig
from toad_tpu.models.resnet_encoder import make_embedder
from toad_tpu.utils.profiling import annotate


def read_patch_file(path: str | os.PathLike):
    """Open a CLAM-style patch h5 and return (imgs_dataset, coords or None).

    ``imgs`` stays an h5py dataset (lazy) so huge slides stream without
    loading all tiles at once.
    """
    import h5py

    f = h5py.File(path, "r")
    key = "imgs" if "imgs" in f else ("patches" if "patches" in f else None)
    if key is None:
        f.close()
        raise KeyError(f"{path}: no 'imgs'/'patches' dataset (found: {list(f)})")
    coords = np.asarray(f["coords"][:]) if "coords" in f else None
    return f, f[key], coords


def iter_tile_batches(imgs, batch_size: int) -> Iterator[tuple[np.ndarray, int]]:
    """Yield (batch [B,H,W,3] uint8, n_valid); the last batch is zero-padded
    to the full batch size so every step hits the same compiled program."""
    n = imgs.shape[0]
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        chunk = np.asarray(imgs[start:stop])
        valid = stop - start
        if valid < batch_size:
            pad = np.zeros((batch_size - valid, *chunk.shape[1:]), chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        yield chunk, valid


class TileEmbedder:
    """Jitted uint8-tiles -> features embedder with a fixed batch shape.

    `config` selects the encoder family: :class:`EncoderConfig` (truncated
    ResNet-50) or :class:`toad_tpu.models.vit_encoder.ViTConfig` (UNI-style
    ViT, the BASELINE.json foundation-model stretch config)."""

    def __init__(self, params: Any, config: Any = EncoderConfig(), batch_size: int = 128, mesh=None):
        """``mesh``: optional :class:`jax.sharding.Mesh` — tile batches shard
        over its first axis (data-parallel featurization; params replicated,
        no collectives needed). batch_size must divide by the axis size."""
        self.config = config
        self.batch_size = batch_size
        self.mesh = mesh
        if isinstance(config, EncoderConfig):
            self.folded_params, self._embed_fn = make_embedder(config, params)
        else:
            from toad_tpu.models.vit_encoder import ViTConfig, make_vit_embedder

            if not isinstance(config, ViTConfig):
                raise TypeError(f"unsupported encoder config: {type(config)}")
            self.folded_params, self._embed_fn = make_vit_embedder(config, params)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            n_dev = mesh.shape[axis]
            if batch_size % n_dev:
                raise ValueError(f"batch_size {batch_size} not divisible by mesh axis {axis}={n_dev}")
            self._tile_sharding = NamedSharding(mesh, P(axis, None, None, None))
            self.folded_params = jax.device_put(self.folded_params, NamedSharding(mesh, P()))
        else:
            self._tile_sharding = None

    def _put(self, tiles_uint8) -> jax.Array:
        if self._tile_sharding is not None:
            return jax.device_put(np.asarray(tiles_uint8), self._tile_sharding)
        return jnp.asarray(tiles_uint8)

    def _embed(self, tiles: jax.Array) -> jax.Array:
        # always pass the CURRENT folded_params (possibly mesh-replicated
        # above) — params are jit arguments, never closure constants
        return self._embed_fn(self.folded_params, tiles)

    def __call__(self, tiles_uint8: np.ndarray) -> jax.Array:
        return self._embed(self._put(tiles_uint8))

    def embed_all(self, imgs, progress: Callable[[int, int], None] | None = None) -> np.ndarray:
        """Stream every tile of an (h5 dataset or array) into a [N, D] bag."""
        n = int(imgs.shape[0])
        outs: list[jax.Array] = []
        valids: list[int] = []
        done = 0
        for chunk, valid in iter_tile_batches(imgs, self.batch_size):
            with annotate("toad.featurize.embed_dispatch"):
                outs.append(self._embed(self._put(chunk)))  # async dispatch
            valids.append(valid)
            done += valid
            if progress is not None:
                progress(done, n)
        feats = [np.asarray(o)[:v] for o, v in zip(outs, valids)]
        return np.concatenate(feats, axis=0) if feats else np.zeros((0, self.config.out_dim), np.float32)


TILE_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def list_tile_files(tile_dir: str | os.PathLike) -> list[Path]:
    """Sorted tile-image files (PNG/JPEG/BMP/TIFF) directly under a directory.

    This is the other common patch layout besides CLAM h5: one image file per
    tile (what generic tiling tools emit). Sorted by name so bag row order is
    deterministic."""
    tile_dir = Path(tile_dir)
    files = sorted(p for p in tile_dir.iterdir() if p.suffix.lower() in TILE_IMAGE_EXTS)
    if not files:
        raise FileNotFoundError(f"no tile images ({'/'.join(TILE_IMAGE_EXTS)}) in {tile_dir}")
    return files


def parse_tile_coords(files: list[Path]) -> np.ndarray | None:
    """Recover (x, y) coords from ``..._{x}_{y}.ext`` filenames (the common
    tile-export convention). Returns [N, 2] int64, or None unless EVERY file
    parses — partial coords would silently misalign heatmaps."""
    import re

    pat = re.compile(r"(\d+)_(\d+)$")
    coords = []
    for f in files:
        m = pat.search(f.stem)
        if m is None:
            return None
        coords.append((int(m.group(1)), int(m.group(2))))
    return np.asarray(coords, np.int64)


def iter_decoded_tile_batches(
    files: list[Path],
    batch_size: int,
    prefetch: int = 4,
    stats: dict | None = None,
) -> Iterator[tuple[np.ndarray, int]]:
    """Decode tile images on a producer thread into padded uint8 batches.

    Yields ``(batch [B, H, W, 3] uint8, n_valid)`` like
    :func:`iter_tile_batches`; the last batch is zero-padded so every step
    hits one compiled program. Decode (PIL) runs in a daemon thread feeding a
    bounded queue, so with async device dispatch the decode of batch ``i+1``
    overlaps device compute of batch ``i`` — the same overlap discipline as
    the training batcher (``data/batching.py``). All tiles must share one
    shape (it is the compiled shape); a mismatch raises with both shapes.

    ``stats`` (optional dict) receives ``decode_s`` — cumulative seconds the
    producer spent in decode — for host-cost decomposition."""
    import queue
    import threading

    from PIL import Image

    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
    _END = object()

    def produce() -> None:
        try:
            batch: np.ndarray | None = None
            filled = 0
            for f in files:
                t0 = time.perf_counter()
                with Image.open(f) as im:
                    arr = np.asarray(im.convert("RGB"), np.uint8)
                if stats is not None:
                    stats["decode_s"] = stats.get("decode_s", 0.0) + (time.perf_counter() - t0)
                if batch is None:
                    batch = np.zeros((batch_size, *arr.shape), np.uint8)
                elif arr.shape != batch.shape[1:]:
                    raise ValueError(
                        f"{f}: tile shape {arr.shape} != first tile's {tuple(batch.shape[1:])}"
                    )
                batch[filled] = arr
                filled += 1
                if filled == batch_size:
                    q.put((batch, filled))
                    batch, filled = None, 0
            if filled:
                q.put((batch, filled))
            q.put(_END)
        except BaseException as e:  # surface decode errors in the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True, name="toad-tile-decode").start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def featurize_tile_dir(
    embedder: TileEmbedder,
    tile_dir: str | os.PathLike,
    out: str | os.PathLike,
    progress: Callable[[int, int], None] | None = None,
    int8: bool = False,
    prefetch: int = 4,
) -> dict[str, Any]:
    """One slide from a directory of tile images: decode (overlapped producer
    thread) -> encoder -> feature bag on disk. Coords are recovered from
    ``..._{x}_{y}`` filenames when every tile has them (heatmaps work), else
    omitted. Pixels-from-disk counterpart of :func:`featurize_patch_file`."""
    files = list_tile_files(tile_dir)
    n = len(files)
    stats: dict[str, float] = {}
    t0 = time.perf_counter()
    outs: list[jax.Array] = []
    valids: list[int] = []
    done = 0
    with annotate("toad.featurize.slide_tiles"):
        for chunk, valid in iter_decoded_tile_batches(files, embedder.batch_size, prefetch, stats):
            with annotate("toad.featurize.embed_dispatch"):
                outs.append(embedder(chunk))  # async dispatch; decode overlaps
            valids.append(valid)
            done += valid
            if progress is not None:
                progress(done, n)
        feats = np.concatenate([np.asarray(o)[:v] for o, v in zip(outs, valids)], axis=0)
    dt = time.perf_counter() - t0
    write_bag(out, feats, parse_tile_coords(files), int8=int8)
    return {
        "n_patches": n,
        "seconds": dt,
        "patches_per_s": n / dt if dt > 0 else float("inf"),
        "decode_s": round(stats.get("decode_s", 0.0), 4),
        "out": str(out),
    }


def write_bag(
    path: str | os.PathLike,
    features: np.ndarray,
    coords: np.ndarray | None = None,
    int8: bool = False,
) -> None:
    """Write a feature bag in the format implied by the extension
    (.h5 with features[+coords] — the reference's eval contract
    (``dataset_mtl_concat.py:377-383``) — or .npy/.npz/.pt). With
    ``int8=True`` (requires .npz) rows are quantized on write
    (``data/bags.py::save_int8_bag``): 4x smaller, loads transparently."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    ext = path.suffix.lower()
    if int8:
        if ext != ".npz":
            raise ValueError(f"int8 bags are .npz files, got {path}")
        from toad_tpu.data.bags import save_int8_bag

        save_int8_bag(path, features, coords)
        return
    if ext == ".h5":
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("features", data=features)
            if coords is not None:
                f.create_dataset("coords", data=coords)
    elif ext == ".npy":
        np.save(path, features)
        if coords is not None:  # .npy can't embed coords — sidecar, not silent loss
            np.save(path.with_suffix(".coords.npy"), coords)
    elif ext == ".npz":
        if coords is not None:
            np.savez(path, features=features, coords=coords)
        else:
            np.savez(path, features=features)
    elif ext == ".pt":
        from toad_tpu.data.torch_io import save_torch_pickle

        save_torch_pickle(path, np.ascontiguousarray(features, np.float32))
        if coords is not None:  # reference .pt bags are a bare tensor — sidecar
            np.save(path.with_suffix(".coords.npy"), coords)
    else:
        raise ValueError(f"unsupported bag format: {path}")


def featurize_patch_file(
    embedder: TileEmbedder,
    src: str | os.PathLike,
    out: str | os.PathLike,
    progress: Callable[[int, int], None] | None = None,
    int8: bool = False,
) -> dict[str, Any]:
    """One slide: patch h5 -> feature bag on disk. Returns throughput stats."""
    f, imgs, coords = read_patch_file(src)
    try:
        t0 = time.perf_counter()
        with annotate("toad.featurize.slide"):
            feats = embedder.embed_all(imgs, progress=progress)  # numpy: already synced
        dt = time.perf_counter() - t0
        write_bag(out, feats, coords, int8=int8)
    finally:
        f.close()
    n = int(feats.shape[0])
    return {"n_patches": n, "seconds": dt, "patches_per_s": n / dt if dt > 0 else float("inf"), "out": str(out)}
