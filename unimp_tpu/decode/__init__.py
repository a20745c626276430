"""Autoregressive generation: KV-cached greedy and beam search."""

from unimp_tpu.decode.sampler import GenerationConfig, Generator

__all__ = ["GenerationConfig", "Generator"]
