"""toad_tpu — TPU-native framework for weakly-supervised tumor-origin prediction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mahmoodlab/TOAD
(attention-based multiple-instance learning with multi-task heads over
whole-slide-image feature bags), designed TPU-first:

- bags are batched and padded to bucketed lengths; every hot path is a single
  jitted step (no per-bag host round-trips, unlike the reference's
  ``utils/core_utils_mtl_concat.py:190-259`` loop),
- the gated-attention pooling (reference ``models/model_toad.py:90-116``) is
  available as a fused Pallas kernel,
- scaling is via ``jax.sharding.Mesh`` (data-parallel over bags and
  bag-sharded pooling over patches) rather than ``nn.DataParallel``
  (reference ``models/model_toad.py:77-88``).
"""

from toad_tpu.version import __version__

# Lazy top-level API: heavy deps (jax, h5py, orbax) only load when touched.
_EXPORTS = {
    "TaskConfig": "toad_tpu.config",
    "ModelConfig": "toad_tpu.config",
    "EncoderConfig": "toad_tpu.config",
    "OptimConfig": "toad_tpu.config",
    "DataConfig": "toad_tpu.config",
    "TrainConfig": "toad_tpu.config",
    "EvalConfig": "toad_tpu.config",
    "ViTConfig": "toad_tpu.models.vit_encoder",
    "ToadMIL": "toad_tpu.models.toad_mil",
    "ResNetEncoder": "toad_tpu.models.resnet_encoder",
    "ViTEncoder": "toad_tpu.models.vit_encoder",
    "WSIBagDataset": "toad_tpu.data.wsi_dataset",
    "WSIBagSplit": "toad_tpu.data.wsi_dataset",
    "PatientBagSplit": "toad_tpu.data.wsi_dataset",
    "BagBatcher": "toad_tpu.data.batching",
    "FoldTrainer": "toad_tpu.train.loop",
    "train_folds_parallel": "toad_tpu.train.parallel_folds",
    "evaluate_checkpoint": "toad_tpu.evaluate.engine",
    "evaluate_split": "toad_tpu.evaluate.engine",
    "bootstrap_result_cis": "toad_tpu.evaluate.engine",
    "bootstrap_cis": "toad_tpu.evaluate.metrics",
    "fit_temperature": "toad_tpu.evaluate.calibration",
    "apply_temperature": "toad_tpu.evaluate.calibration",
    "top_label_ece": "toad_tpu.evaluate.calibration",
    "calibration_report": "toad_tpu.evaluate.calibration",
    "auto_bucket_ladder": "toad_tpu.data.batching",
    "bag_shape": "toad_tpu.data.bags",
    "SlideInference": "toad_tpu.pipeline.infer",
    "EnsembleInference": "toad_tpu.pipeline.infer",
    "InferenceService": "toad_tpu.serve.server",
    "DynamicBatcher": "toad_tpu.serve.batcher",
    "ServeConfig": "toad_tpu.serve.batcher",
    "TileEmbedder": "toad_tpu.pipeline.featurize",
    "render_heatmap": "toad_tpu.pipeline.heatmap",
    "load_task": "toad_tpu.registry",
}

__all__ = ["__version__", *sorted(_EXPORTS)]


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'toad_tpu' has no attribute {name!r}")
