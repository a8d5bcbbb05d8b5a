"""``python -m toad_tpu export`` — convert a checkpoint to the reference's
torch ``s_{fold}_checkpoint.pt`` layout.

Migration back-door for users who still run the reference
(``eval_mtl_concat.py`` loads ``state_dict`` files,
``/root/reference/utils/eval_utils_mtl_concat.py:27-29``): a model trained
here exports to a file the reference loads verbatim, with the exact
Sequential key indices (which shift with dropout — the reference inserts
``nn.Dropout`` modules into the stack when ``--drop_out`` is set,
``models/model_toad.py:59-70``). The reverse direction needs no converter:
every consumer here accepts reference ``.pt`` checkpoints directly.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True, help="Orbax checkpoint dir (or a torch .pt to re-export)")
    p.add_argument("--out", type=str, required=True, help="output .pt path (reference state_dict layout)")
    p.add_argument("--encoding_size", type=int, default=1024)
    p.add_argument("--n_classes", type=int, default=18)
    p.add_argument(
        "--drop_out", action="store_true", default=False,
        help="emit the dropout-variant key layout (reference models built with --drop_out)",
    )
    return p


def main(argv=None) -> None:
    args = make_parser().parse_args(argv)

    import numpy as np

    from toad_tpu.config import ModelConfig
    from toad_tpu.models.torch_interop import export_torch_checkpoint
    from toad_tpu.train.checkpoint import load_params_any

    cfg = ModelConfig(in_dim=args.encoding_size, n_classes=args.n_classes)
    params = load_params_any(args.ckpt, cfg)
    import jax

    params = jax.tree.map(np.asarray, params)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    export_torch_checkpoint(out, params, dropout=args.drop_out)
    print(f"exported {args.ckpt} -> {out} (reference state_dict layout, drop_out={args.drop_out})")


if __name__ == "__main__":
    main()
