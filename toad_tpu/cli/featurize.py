"""``python -m toad_tpu.cli.featurize`` — patch tiles -> feature bags on TPU.

The featurization stage the reference outsources to CLAM
(``docs/README.md:39``), as a framework CLI: every ``*.h5`` patch file in
``--patch_dir`` (CLAM layout: ``imgs`` [N,H,W,3] uint8 + ``coords``) is
embedded through the truncated ResNet-50 and written to ``--feat_dir`` as a
feature bag usable by training/eval/inference.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np

from toad_tpu.config import EncoderConfig
from toad_tpu.models.resnet_encoder import ResNetEncoder, load_torchvision_weights
from toad_tpu.pipeline.featurize import TileEmbedder, featurize_patch_file


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TOAD-TPU patch featurization")
    p.add_argument("--patch_dir", type=str, default=None, help="dir of {slide_id}.h5 patch files")
    p.add_argument("--tile_dir", type=str, default=None,
                   help="dir of per-slide SUBDIRECTORIES of tile images (PNG/JPEG/...); "
                        "the pixels-from-disk layout — decode runs on an overlapped "
                        "producer thread; coords recovered from ..._{x}_{y} filenames")
    p.add_argument("--feat_dir", type=str, required=True, help="output dir for feature bags")
    p.add_argument("--format", type=str, choices=["h5", "npy", "npz", "pt", "int8"], default="h5",
                   help="bag format; 'int8' writes row-quantized .npz bags (4x smaller, "
                        "loads transparently, feeds --int8 inference without host requantization)")
    p.add_argument("--encoder", type=str, choices=["resnet50", "vit"], default="resnet50",
                   help="patch encoder family: truncated ResNet-50 or UNI-style ViT-L")
    p.add_argument("--weights", type=str, default=None,
                   help="encoder weights: torchvision resnet50 .pth or timm ViT .bin (random init if omitted)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--data_shards", type=int, default=None,
                   help="shard each tile batch over this many devices (data-parallel "
                        "featurization; params replicated, no collectives). batch_size "
                        "must be divisible by it; defaults to single-device")
    p.add_argument("--no_bf16", action="store_true", help="compute in float32 instead of bfloat16")
    p.add_argument("--no_fold_bn", action="store_true", help="keep BatchNorm unfolded")
    p.add_argument("--skip_done", action="store_true", help="skip slides whose bag already exists")
    p.add_argument("--profile", type=str, default=None, metavar="DIR", help="capture a jax.profiler trace of the run")
    p.add_argument("--compile_cache", type=str, default=None, metavar="DIR", help="persistent XLA compilation cache")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    if (args.patch_dir is None) == (args.tile_dir is None):
        raise SystemExit("give exactly one of --patch_dir (CLAM h5) or --tile_dir (tile images)")
    if args.compile_cache:
        from toad_tpu.cli.common import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    if args.encoder == "vit":
        from toad_tpu.models.vit_encoder import ViTConfig, ViTEncoder, load_timm_weights

        if args.weights:
            params, cfg = load_timm_weights(args.weights)
            if args.no_bf16:
                cfg = ViTConfig(**{**cfg.__dict__, "compute_dtype": "float32"})
            print(f"loaded ViT weights from {args.weights} (width {cfg.width}, depth {cfg.depth})")
        else:
            print("WARNING: no --weights given; using random ViT-L init (features are untrained)")
            cfg = ViTConfig(compute_dtype="float32" if args.no_bf16 else "bfloat16")
            params = ViTEncoder(cfg).init(jax.random.PRNGKey(0))
    else:
        cfg = EncoderConfig(
            compute_dtype="float32" if args.no_bf16 else "bfloat16",
            fold_bn=not args.no_fold_bn,
        )
        if args.weights:
            params = load_torchvision_weights(args.weights, cfg)
            print(f"loaded encoder weights from {args.weights}")
        else:
            print("WARNING: no --weights given; using random encoder init (features are untrained)")
            params = ResNetEncoder(cfg).init(jax.random.PRNGKey(0))

    mesh = None
    if args.data_shards is not None and args.data_shards != 1:
        if args.data_shards < 1:
            raise SystemExit(f"--data_shards must be >= 1, got {args.data_shards}")
        devs = jax.devices()
        if args.data_shards > len(devs):
            raise SystemExit(f"--data_shards {args.data_shards} > available devices {len(devs)}")
        if args.batch_size % args.data_shards:
            raise SystemExit(
                f"--batch_size {args.batch_size} is not divisible by --data_shards {args.data_shards}"
            )
        from jax.sharding import Mesh

        # 1-D data-parallel mesh over exactly the requested devices; the
        # encoder is per-tile math, so GSPMD splits the batch with zero
        # collectives (parity test: tests/test_pipeline.py mesh tests)
        mesh = Mesh(np.array(devs[: args.data_shards]), ("data",))
    embedder = TileEmbedder(params, cfg, batch_size=args.batch_size, mesh=mesh)
    feat_dir = Path(args.feat_dir)
    feat_dir.mkdir(parents=True, exist_ok=True)
    if args.tile_dir is not None:
        src_root = Path(args.tile_dir)
        files = sorted(p for p in src_root.iterdir() if p.is_dir())
        if not files:
            raise FileNotFoundError(f"no per-slide tile subdirectories in {src_root}")
    else:
        patch_dir = Path(args.patch_dir)
        files = sorted(patch_dir.glob("*.h5"))
        if not files:
            raise FileNotFoundError(f"no .h5 patch files in {patch_dir}")

    from toad_tpu.utils.profiling import profile_trace

    with profile_trace(args.profile, enabled=args.profile is not None):
        _run_all(args, files, feat_dir, embedder)


def _bag_matches_format(path: Path, int8: bool) -> bool:
    """Does an existing bag file actually hold the requested format?
    int8 and f32 bags share the .npz extension, so --skip_done must look
    inside (zip member names only) rather than trust the filename."""
    if path.suffix != ".npz":
        return not int8
    import zipfile

    try:
        with zipfile.ZipFile(path) as zf:
            return ("features_int8.npy" in zf.namelist()) == int8
    except Exception:
        return False  # corrupt/partial: re-featurize


def _run_all(args, files, feat_dir, embedder):
    total_patches, total_s = 0, 0.0
    int8 = args.format == "int8"
    ext = "npz" if int8 else args.format
    # data/bags.py::bag_path resolves {stem}.pt before .h5/.npy/.npz — a
    # stale bag in a higher-priority format would silently shadow the new one
    shadow_exts = {"pt": [], "h5": ["pt"], "npy": ["pt", "h5"],
                   "npz": ["pt", "h5", "npy"], "int8": ["pt", "h5", "npy"]}[args.format]
    shadowed = []
    for i, src in enumerate(files):
        out = feat_dir / f"{src.stem}.{ext}"
        stale = [feat_dir / f"{src.stem}.{e}" for e in shadow_exts]
        shadowed.extend(str(p) for p in stale if p.exists())
        if args.skip_done and out.exists() and _bag_matches_format(out, int8):
            print(f"[{i + 1}/{len(files)}] {src.stem}: exists, skipped")
            continue
        if src.is_dir():
            from toad_tpu.pipeline.featurize import featurize_tile_dir

            stats = featurize_tile_dir(embedder, src, out, int8=int8)
        else:
            stats = featurize_patch_file(embedder, src, out, int8=int8)
        total_patches += stats["n_patches"]
        total_s += stats["seconds"]
        print(
            f"[{i + 1}/{len(files)}] {src.stem}: {stats['n_patches']} patches "
            f"in {stats['seconds']:.2f}s ({stats['patches_per_s']:.0f} patches/s) -> {out}"
        )
    if shadowed:
        print(
            f"WARNING: {len(shadowed)} stale bag(s) in other formats shadow the "
            f".{ext} output at load time (bag_path prefers .pt/.h5/.npy) — delete "
            f"them to use the new bags: {shadowed[:5]}{' ...' if len(shadowed) > 5 else ''}"
        )
    print(json.dumps({
        "slides": len(files),
        "patches": total_patches,
        "patches_per_s": total_patches / total_s if total_s else 0.0,
        "shadowed_stale_bags": len(shadowed),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
