from toad_tpu.utils.io import save_pkl, load_pkl, write_settings
from toad_tpu.utils.rng import seed_everything


def param_count(params) -> int:
    """Total parameter count of any pytree (reference ``print_network``,
    ``utils/utils.py:72-84``). The ONE definition shared by every model."""
    import jax
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


__all__ = ["save_pkl", "load_pkl", "write_settings", "seed_everything", "param_count"]
