"""Determinism helpers (reference ``seed_torch``, ``main_mtl_concat.py:109-121``).

JAX is deterministic by construction given a PRNGKey; the residual global
state is Python's/NumPy's RNG used by split generation and samplers.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int) -> None:
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
