"""Optimizer factory matching the reference's torch semantics.

Reference (``utils/utils.py:63-70``): ``optim.Adam(lr, weight_decay)`` or
``optim.SGD(lr, momentum=0.9, weight_decay)``. torch's ``weight_decay`` is
L2-added-to-the-gradient *before* the moment updates (not decoupled AdamW),
so the optax chain places ``add_decayed_weights`` first.
"""

from __future__ import annotations

import optax

from toad_tpu.config import OptimConfig


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.name == "adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
            optax.scale(-cfg.lr),
        )
    if cfg.name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.momentum, nesterov=False),
            optax.scale(-cfg.lr),
        )
    raise NotImplementedError(f"optimizer {cfg.name!r}")
