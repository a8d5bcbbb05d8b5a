"""Online serving: dynamic-batching TPU inference behind a JSON HTTP API.

A capability the reference lacks entirely (its only inference path is the
offline, label-requiring ``eval_mtl_concat.py``). See
:mod:`toad_tpu.serve.batcher` for the batching discipline and
:mod:`toad_tpu.serve.server` for the HTTP surface.
"""

from toad_tpu.serve.batcher import BatcherStats, DynamicBatcher, ServeConfig
from toad_tpu.serve.server import InferenceService, make_http_server, serve_in_thread

__all__ = [
    "BatcherStats",
    "DynamicBatcher",
    "ServeConfig",
    "InferenceService",
    "make_http_server",
    "serve_in_thread",
]
