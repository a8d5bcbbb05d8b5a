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

__all__ = ["__version__"]
