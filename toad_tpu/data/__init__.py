from toad_tpu.data.wsi_dataset import WSIBagDataset, SlideRecord
from toad_tpu.data.splits import (
    SplitSpec,
    generate_splits,
    save_split_columnar,
    save_split_boolean,
    split_descriptor,
    load_split_csv,
)
from toad_tpu.data.bags import load_bag, load_pt_tensor, load_h5_bag
from toad_tpu.data.batching import BagBatch, BagBatcher, bucket_for

__all__ = [
    "WSIBagDataset",
    "SlideRecord",
    "SplitSpec",
    "generate_splits",
    "save_split_columnar",
    "save_split_boolean",
    "split_descriptor",
    "load_split_csv",
    "load_bag",
    "load_pt_tensor",
    "load_h5_bag",
    "BagBatch",
    "BagBatcher",
    "bucket_for",
]
