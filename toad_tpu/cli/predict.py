"""``python -m toad_tpu.cli.predict`` — bulk inference over unlabeled slides.

The reference's eval script requires ground-truth labels in the CSV; this
command predicts tumor origin + site for a directory of feature bags (or a
manifest with just ``slide_id`` and optional ``sex``) and writes a
predictions CSV — the deployment-shaped entry point.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from toad_tpu.config import ModelConfig


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TOAD-TPU bulk slide prediction")
    p.add_argument("--ckpt", type=str, required=True, help="Orbax checkpoint dir or reference s_k_checkpoint.pt")
    p.add_argument("--data_dir", type=str, required=True, help="directory of feature bags")
    p.add_argument("--csv", type=str, default=None,
                   help="manifest with slide_id[,sex]; defaults to every bag file in --data_dir")
    p.add_argument("--out", type=str, required=True, help="output predictions CSV")
    p.add_argument("--task", type=str, default=None, help="task name/JSON for class label names")
    p.add_argument("--n_classes", type=int, default=18)
    p.add_argument("--encoding_size", type=int, default=1024)
    p.add_argument("--sex", type=str, default=None, help="fallback sex (F/M) when the manifest has none")
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--pallas", action="store_true", default=False)
    p.add_argument("--int8", action="store_true", default=False,
                   help="quantized pooling fast path (int8 MXU GEMMs; heads stay f32)")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="calibrated softmax temperature for class probabilities (fit with evaluate --calibrate)")
    p.add_argument("--ensemble", action="store_true", default=False,
                   help="mean-of-folds CV ensemble: --ckpt is a training results dir "
                        "(every s_<k>_checkpoint in it joins) or a comma-separated "
                        "checkpoint list; probabilities are the mean of the members' softmax")
    from toad_tpu.cli.common import add_buckets_arg, add_temperature_from_arg
    add_temperature_from_arg(p)
    add_buckets_arg(p)
    return p


def main(argv=None):
    from toad_tpu.cli.common import parse_sex

    args = make_parser().parse_args(argv)
    topk = max(1, args.topk)
    data_dir = Path(args.data_dir)

    if args.csv:
        df = pd.read_csv(args.csv)
        if "slide_id" not in df.columns:
            raise ValueError(f"{args.csv}: manifest needs a slide_id column")
        slides = [str(s) for s in df["slide_id"]]
        if "sex" in df.columns:
            # NaN/blank cells fall back to --sex (pandas float-codes the
            # whole column when any value is missing; parse_sex handles '1.0')
            sexes = [args.sex if pd.isna(v) else v for v in df["sex"]]
        else:
            sexes = [args.sex] * len(slides)
    else:
        files = sorted(
            p
            for ext in (".pt", ".h5", ".npy", ".npz")
            for p in data_dir.glob(f"*{ext}")
            if not p.name.endswith(".coords.npy")  # featurizer coords sidecars
        )
        if not files:
            raise FileNotFoundError(f"no bag files in {data_dir}")
        slides = sorted({p.stem for p in files})
        sexes = [args.sex] * len(slides)

    model_cfg = ModelConfig(
        in_dim=args.encoding_size,
        n_classes=args.n_classes,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.pallas,
    )
    from toad_tpu.data.bags import bag_path
    from toad_tpu.pipeline.infer import SlideInference, infer_feature_bag

    from toad_tpu.cli.common import resolve_buckets, resolve_temperature
    kw = dict(int8=args.int8,
              temperature=resolve_temperature(args.temperature, args.temperature_from),
              bucket_sizes=resolve_buckets(args.buckets))
    if args.ensemble:
        from toad_tpu.pipeline.infer import EnsembleInference

        inference = EnsembleInference.from_spec(args.ckpt, model_cfg, **kw)
        n_members = len(inference.members)
        print(f"ensemble: {n_members} fold checkpoints")
    else:
        inference = SlideInference.from_checkpoint(args.ckpt, model_cfg, **kw)

    inv = None
    if args.task:
        from toad_tpu.registry import load_task
        from toad_tpu.utils import invert_labels

        task = load_task(args.task)
        inv = invert_labels(task.label_dicts[0])

    rows = []
    for slide_id, sex in zip(slides, sexes):
        if sex is None:
            raise SystemExit(f"{slide_id}: no sex in manifest and no --sex fallback given")
        pred, _ = infer_feature_bag(inference, bag_path(data_dir, slide_id), parse_sex(sex))
        row = {
            "slide_id": slide_id,
            "sex": parse_sex(sex),
            "Y_hat": pred.y_hat,
            "prediction": inv.get(pred.y_hat, str(pred.y_hat)) if inv else str(pred.y_hat),
            "site_hat": pred.site_hat,
            "site": "Metastatic" if pred.site_hat else "Primary",
            "n_patches": int(pred.attention.shape[0]),
        }
        for r, (ci, prob) in enumerate(pred.topk[:topk], start=1):
            row[f"top{r}"] = inv.get(ci, str(ci)) if inv else str(ci)
            row[f"top{r}_p"] = round(float(prob), 6)
        for ci, prob in enumerate(pred.y_prob):
            row[f"p_{ci}"] = float(prob)
        row["site_p"] = float(pred.site_prob[1])
        rows.append(row)
        print(f"{slide_id}: {row['prediction']} (p={row['top1_p']}) {row['site']}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(out, index=False)
    print(f"wrote {out} ({len(rows)} slides)")


if __name__ == "__main__":
    main()
