"""Image tiling: RGB images -> CLAM-style patch files (``imgs`` + ``coords``).

The reference pipeline assumes patches already exist (CLAM's create_patches
step, ``docs/README.md:24-39``). This module supplies that stage for plain
raster images (PNG/JPEG/TIFF via PIL): grid tiling with a saturation-based
tissue filter (the standard H&E heuristic — background is near-white, i.e.
low saturation), writing the same h5 layout the featurizer consumes.

Pyramidal scanner formats (.svs etc.) need openslide, which is not in this
image; those users bring CLAM patch files directly.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def saturation(tiles: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Mean HSV saturation per tile, vectorized from RGB uint8.
    tiles: [N, H, W, 3] -> [N] floats in [0, 1].

    Computed in chunks: the float32 HSV temporaries are ~5x the uint8 stack,
    and a 40k-tile slide already holds ~8 GB of uint8 — one-shot conversion
    would OOM the host (single-core, modest RAM per CLAUDE.md)."""
    out = np.empty(len(tiles), np.float32)
    for i in range(0, len(tiles), chunk):
        # uint8 min/max first: the only float tensor is [n, H, W], not [n, H, W, 3]
        mx8 = tiles[i : i + chunk].max(axis=-1)
        mn8 = tiles[i : i + chunk].min(axis=-1)
        mx = mx8.astype(np.float32)
        sat = np.where(mx8 > 0, (mx - mn8.astype(np.float32)) / np.maximum(mx, 1e-6), 0.0)
        out[i : i + chunk] = sat.mean(axis=(1, 2))
    return out


def tile_image(
    image: np.ndarray,  # [H, W, 3] uint8 RGB
    patch_size: int = 256,
    stride: int | None = None,
    tissue_threshold: float | None = 0.05,
) -> tuple[np.ndarray, np.ndarray]:
    """Grid-tile an image. Returns (imgs [N, P, P, 3] uint8, coords [N, 2]
    as (x, y) top-left, the CLAM convention). Partial edge tiles are dropped.
    ``tissue_threshold`` keeps tiles whose mean saturation exceeds it
    (None keeps everything)."""
    if image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(f"expected [H, W, 3] RGB, got {image.shape}")
    stride = stride or patch_size
    h, w = image.shape[:2]
    xs = range(0, w - patch_size + 1, stride)
    ys = range(0, h - patch_size + 1, stride)
    tiles, coords = [], []
    for y in ys:
        for x in xs:
            tiles.append(image[y : y + patch_size, x : x + patch_size])
            coords.append((x, y))
    if not tiles:
        return (
            np.zeros((0, patch_size, patch_size, 3), np.uint8),
            np.zeros((0, 2), np.int64),
        )
    imgs = np.stack(tiles).astype(np.uint8)
    coords = np.asarray(coords, np.int64)
    if tissue_threshold is not None:
        keep = saturation(imgs) > tissue_threshold
        imgs, coords = imgs[keep], coords[keep]
    return imgs, coords


def write_patch_h5(path: str | os.PathLike, imgs: np.ndarray, coords: np.ndarray) -> None:
    import h5py

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        # h5py rejects chunk shapes larger than the data shape, so an empty
        # stack (tiny or background-only slide) must write contiguous
        chunks = (min(64, len(imgs)), *imgs.shape[1:]) if len(imgs) else None
        f.create_dataset("imgs", data=imgs, chunks=chunks)
        f.create_dataset("coords", data=coords)


def image_to_patch_file(
    src: str | os.PathLike,
    out: str | os.PathLike,
    patch_size: int = 256,
    stride: int | None = None,
    tissue_threshold: float | None = 0.05,
) -> dict:
    """Load an image file (PIL), tile it, write the patch h5."""
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None  # WSIs are huge by design
    with Image.open(src) as im:
        arr = np.asarray(im.convert("RGB"))
    imgs, coords = tile_image(arr, patch_size=patch_size, stride=stride, tissue_threshold=tissue_threshold)
    write_patch_h5(out, imgs, coords)
    total = ((arr.shape[1] - patch_size) // (stride or patch_size) + 1) * (
        (arr.shape[0] - patch_size) // (stride or patch_size) + 1
    ) if min(arr.shape[:2]) >= patch_size else 0
    return {"n_patches": int(len(imgs)), "n_grid": int(max(total, 0)), "image_hw": arr.shape[:2], "out": str(out)}
