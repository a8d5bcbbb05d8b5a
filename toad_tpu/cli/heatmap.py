"""``python -m toad_tpu.cli.heatmap`` — render a heatmap PNG from a saved
attention file (the ``--save_attention`` output of ``toad_tpu.cli.infer``),
or from any h5 holding ``attention`` (or ``scores``) + ``coords``.

Separating render from inference lets users iterate on colormaps/downscale
without re-running the model.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TOAD-TPU attention heatmap rendering")
    p.add_argument("--attention", type=str, required=True, help="h5 with attention/scores + coords")
    p.add_argument("--out", type=str, required=True, help="output PNG")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--downscale", type=int, default=32)
    p.add_argument("--cmap", type=str, default="jet")
    p.add_argument("--no_percentile", action="store_true",
                   help="min-max normalize raw scores instead of rank percentiles")
    p.add_argument("--background", type=str, default=None, help="thumbnail image to blend under the heatmap")
    p.add_argument("--alpha", type=float, default=0.5)
    return p


def main(argv=None):
    import h5py

    from toad_tpu.pipeline.heatmap import render_heatmap, save_png

    args = make_parser().parse_args(argv)
    with h5py.File(args.attention, "r") as f:
        key = "attention" if "attention" in f else ("scores" if "scores" in f else None)
        if key is None:
            raise KeyError(f"{args.attention}: no 'attention'/'scores' dataset (found: {list(f)})")
        if "coords" not in f:
            raise KeyError(f"{args.attention}: no 'coords' dataset — heatmaps need patch positions")
        scores = np.asarray(f[key][:])
        coords = np.asarray(f["coords"][:])

    if args.no_percentile and len(scores):
        # raw attention scores are unbounded; min-max them into the colormap
        # domain (render_heatmap clips to [0, 1])
        lo, hi = float(scores.min()), float(scores.max())
        scores = (scores - lo) / (hi - lo) if hi > lo else np.zeros_like(scores)

    background = None
    if args.background:
        from PIL import Image

        from toad_tpu.pipeline.heatmap import canvas_shape

        h, w = canvas_shape(coords, args.patch_size, args.downscale)
        with Image.open(args.background) as im:
            background = np.asarray(im.convert("RGB").resize((w, h)))

    img = render_heatmap(
        coords,
        scores,
        patch_size=args.patch_size,
        downscale=args.downscale,
        cmap=args.cmap,
        percentile=not args.no_percentile,
        background=background,
        alpha=args.alpha,
    )
    save_png(args.out, img)
    print(f"wrote {Path(args.out).absolute()} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
