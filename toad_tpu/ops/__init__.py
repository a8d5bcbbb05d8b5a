from toad_tpu.ops.pooling import masked_attention_pool, masked_softmax
from toad_tpu.ops.fused_pool import fused_trunk_attention_pool

__all__ = ["masked_attention_pool", "masked_softmax", "fused_trunk_attention_pool"]
