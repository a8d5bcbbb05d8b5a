"""End-to-end WSI pipeline: featurization, slide inference, heatmaps."""

from toad_tpu.pipeline.featurize import TileEmbedder, featurize_patch_file, write_bag
from toad_tpu.pipeline.heatmap import render_heatmap, save_png, to_percentiles
from toad_tpu.pipeline.infer import (
    EnsembleInference,
    SlideInference,
    SlidePrediction,
    find_fold_checkpoints,
    infer_feature_bag,
    infer_patch_file,
)

__all__ = [
    "EnsembleInference",
    "find_fold_checkpoints",
    "TileEmbedder",
    "featurize_patch_file",
    "write_bag",
    "render_heatmap",
    "save_png",
    "to_percentiles",
    "SlideInference",
    "SlidePrediction",
    "infer_feature_bag",
    "infer_patch_file",
]
