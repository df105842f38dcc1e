from distdiff_tpu.ops import attention
from distdiff_tpu.ops.attention import attention as attention_fn, xla_attention

__all__ = ["attention", "attention_fn", "xla_attention"]
