"""TPU compute kernels: Pallas flash attention + XLA reference ops."""

from unimp_tpu.ops.attention import multi_head_attention, AttnMask
from unimp_tpu.ops.attention_ref import attention_xla

__all__ = ["multi_head_attention", "AttnMask", "attention_xla"]
