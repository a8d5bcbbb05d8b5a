from toad_tpu.train.optim import make_optimizer
from toad_tpu.train.loop import FoldTrainer, train_fold
from toad_tpu.train.parallel_folds import train_folds_parallel
from toad_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, restore_params

__all__ = [
    "make_optimizer",
    "FoldTrainer",
    "train_fold",
    "train_folds_parallel",
    "save_checkpoint",
    "restore_checkpoint",
    "restore_params",
]
