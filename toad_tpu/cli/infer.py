"""``python -m toad_tpu.cli.infer`` — single-slide tumor-origin prediction.

End-to-end inference the reference has no CLI for: either a precomputed
feature bag (``--bag``, the reference's eval-time contract) or a raw patch
h5 (``--patches`` + ``--weights``, full tiles->embed->pool->predict chain),
printing ranked origin predictions as JSON and optionally rendering the
attention heatmap the README showcases (``docs/README.md:118``).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from toad_tpu.config import EncoderConfig, ModelConfig


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TOAD-TPU slide inference")
    p.add_argument("--ckpt", type=str, required=True, help="Orbax checkpoint dir or reference s_k_checkpoint.pt")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--bag", type=str, help="precomputed feature bag (.pt/.h5/.npy/.npz)")
    src.add_argument("--patches", type=str, help="CLAM-style patch h5 (imgs+coords)")
    p.add_argument("--weights", type=str, default=None, help="encoder weights .pth (required with --patches)")
    p.add_argument("--sex", type=str, required=True, help="patient sex: F/M or 0/1")
    p.add_argument("--task", type=str, default=None, help="task name/JSON for class label names")
    p.add_argument("--n_classes", type=int, default=18)
    p.add_argument("--encoding_size", type=int, default=1024)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--heatmap", type=str, default=None, help="write attention heatmap PNG here")
    p.add_argument("--save_attention", type=str, default=None, help="write raw per-patch attention (+coords) to this .h5")
    p.add_argument("--attention_task", type=str, choices=["origin", "site"], default="origin",
                   help="which task's attention drives the heatmap/export")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--downscale", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=64, help="tile batch for --patches")
    p.add_argument("--pallas", action="store_true", default=False)
    p.add_argument("--int8", action="store_true", default=False,
                   help="quantized pooling fast path (int8 MXU GEMMs; heads stay f32)")
    p.add_argument("--ensemble", action="store_true", default=False,
                   help="mean-of-folds ensemble: --ckpt is a training results dir (every "
                        "s_<k>_checkpoint becomes a member) or a comma-separated checkpoint "
                        "list; probabilities are the per-member softmax mean and attention "
                        "(incl. --heatmap) the mean of the members' softmaxed pooling weights")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="calibrated softmax temperature for class probabilities (fit with evaluate --calibrate)")
    from toad_tpu.cli.common import add_buckets_arg, add_temperature_from_arg
    add_temperature_from_arg(p)
    add_buckets_arg(p)
    return p


def main(argv=None):
    from toad_tpu.cli.common import parse_sex

    args = make_parser().parse_args(argv)
    sex = parse_sex(args.sex)

    model_cfg = ModelConfig(in_dim=args.encoding_size, n_classes=args.n_classes, use_pallas=args.pallas)
    from toad_tpu.pipeline.infer import SlideInference, infer_feature_bag, infer_patch_file

    from toad_tpu.cli.common import resolve_buckets, resolve_temperature
    kw = dict(int8=args.int8,
              temperature=resolve_temperature(args.temperature, args.temperature_from),
              bucket_sizes=resolve_buckets(args.buckets))
    if args.ensemble:
        # same --ckpt semantics as predict --ensemble (one shared dispatch)
        from toad_tpu.pipeline.infer import EnsembleInference

        inference = EnsembleInference.from_spec(args.ckpt, model_cfg, **kw)
    else:
        inference = SlideInference.from_checkpoint(args.ckpt, model_cfg, **kw)

    if args.bag:
        pred, coords = infer_feature_bag(inference, args.bag, sex)
    else:
        if not args.weights:
            raise SystemExit("--patches requires --weights (encoder checkpoint)")
        from toad_tpu.models.resnet_encoder import load_torchvision_weights
        from toad_tpu.pipeline.featurize import TileEmbedder

        ecfg = EncoderConfig()
        embedder = TileEmbedder(load_torchvision_weights(args.weights, ecfg), ecfg, batch_size=args.batch_size)
        pred, coords = infer_patch_file(embedder, inference, args.patches, sex)

    inv = None
    if args.task:
        from toad_tpu.registry import load_task
        from toad_tpu.utils import invert_labels

        task = load_task(args.task)
        inv = invert_labels(task.label_dicts[0])

    result = {
        "y_hat": pred.y_hat,
        "prediction": inv.get(pred.y_hat, str(pred.y_hat)) if inv else str(pred.y_hat),
        "topk": [
            {"class": inv.get(i, str(i)) if inv else str(i), "prob": round(p, 6)}
            for i, p in pred.topk[: args.topk]
        ],
        "site": "Metastatic" if pred.site_hat else "Primary",
        "site_prob": [round(float(x), 6) for x in pred.site_prob],
        "n_patches": int(pred.attention.shape[0]),
    }

    attn = pred.attention if args.attention_task == "origin" else pred.site_attention
    if args.save_attention:
        import h5py

        from pathlib import Path as _P

        _P(args.save_attention).parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(args.save_attention, "w") as f:
            d = f.create_dataset("attention", data=attn)
            d.attrs["task"] = args.attention_task
            if coords is not None:
                f.create_dataset("coords", data=coords)
        result["attention_file"] = str(_P(args.save_attention).absolute())
        result["attention_task"] = args.attention_task

    if args.heatmap:
        if coords is None:
            result["heatmap"] = "skipped: no coords in input"
        else:
            from toad_tpu.pipeline.heatmap import render_heatmap, save_png

            img = render_heatmap(coords, attn, patch_size=args.patch_size, downscale=args.downscale)
            save_png(args.heatmap, img)
            result["heatmap"] = str(Path(args.heatmap).absolute())

    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
