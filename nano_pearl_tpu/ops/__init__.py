from nano_pearl_tpu.ops.attention import paged_attention
from nano_pearl_tpu.ops.kv_cache import write_kv, make_kv_cache
from nano_pearl_tpu.ops.sampling import greedy, sample, norm_probs, mask_invalid_logits

__all__ = [
    "paged_attention",
    "write_kv",
    "make_kv_cache",
    "greedy",
    "sample",
    "norm_probs",
    "mask_invalid_logits",
]
