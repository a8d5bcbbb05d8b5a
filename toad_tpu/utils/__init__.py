from toad_tpu.utils.io import save_pkl, load_pkl, write_settings
from toad_tpu.utils.rng import seed_everything


def param_count(params) -> int:
    """Total parameter count of any pytree (reference ``print_network``,
    ``utils/utils.py:72-84``). The ONE definition shared by every model."""
    import jax
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def invert_labels(label_dict: dict) -> dict:
    """index -> display name, FIRST key wins on duplicate indices.

    Task label dicts may carry alias spellings mapping to the same index
    (e.g. the reference fixture's ``Esophagogogastric`` misspelling,
    ``dataset_csv/dummy_dataset.csv``); the canonical name is listed first,
    so first-wins inversion keeps display output canonical while ingestion
    still accepts every alias."""
    inv: dict = {}
    for name, idx in label_dict.items():
        inv.setdefault(idx, name)
    return inv


__all__ = [
    "save_pkl",
    "load_pkl",
    "write_settings",
    "seed_everything",
    "param_count",
    "invert_labels",
]
