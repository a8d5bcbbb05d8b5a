"""Unified CLI dispatcher: ``python -m toad_tpu <command> [args]``.

One entry point over the per-command modules in :mod:`toad_tpu.cli` (the
reference ships three disconnected root-level scripts; SURVEY §1 L6).
``python -m toad_tpu.cli.train`` etc. keep working unchanged.
"""

from __future__ import annotations

import sys

COMMANDS = {
    "train": ("toad_tpu.cli.train", "train k folds (reference main_mtl_concat analog)"),
    "eval": ("toad_tpu.cli.evaluate", "evaluate checkpoints (eval_mtl_concat analog)"),
    "create-splits": ("toad_tpu.cli.create_splits", "stratified k-fold split files"),
    "tile": ("toad_tpu.cli.tile", "raster slides -> patch h5s (tissue-filtered grid)"),
    "featurize": ("toad_tpu.cli.featurize", "patch h5s -> feature bags (ResNet-50 / ViT-L)"),
    "infer": ("toad_tpu.cli.infer", "one slide -> prediction + ranked origins + heatmap"),
    "predict": ("toad_tpu.cli.predict", "bulk prediction over unlabeled bags"),
    "heatmap": ("toad_tpu.cli.heatmap", "render heatmap PNG from saved attention"),
    "serve": ("toad_tpu.cli.serve", "online prediction HTTP server (dynamic batching)"),
    "export": ("toad_tpu.cli.export", "checkpoint -> reference torch state_dict layout"),
    "make-dummy": ("toad_tpu.cli.make_dummy", "synthetic dataset fixtures"),
    "validate": ("toad_tpu.cli.validate", "pre-flight dataset + bag-store checks"),
    "convert": ("toad_tpu.cli.convert", "re-encode a bag store (e.g. f32 .pt -> int8 .npz)"),
    "report": ("toad_tpu.cli.report", "aggregate k-fold metrics (mean/std across folds)"),
}


def _usage() -> str:
    lines = ["usage: python -m toad_tpu <command> [args]", "", "commands:"]
    for name, (_, desc) in COMMANDS.items():
        lines.append(f"  {name:<15} {desc}")
    lines.append("")
    lines.append("run `python -m toad_tpu <command> --help` for per-command flags")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}\n\n{_usage()}", file=sys.stderr)
        return 2
    import importlib

    module = importlib.import_module(COMMANDS[cmd][0])
    module.main(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
