from toad_tpu.utils.io import save_pkl, load_pkl, write_settings
from toad_tpu.utils.rng import seed_everything

__all__ = ["save_pkl", "load_pkl", "write_settings", "seed_everything"]
