"""Data layer: hermetic tokenizer, task prompt builders, collation,
vectorized label masking, and the input pipeline."""

from unimp_tpu.data.tokenizer import UniMPTokenizer
from unimp_tpu.data.vocab import extend_vocabulary, SPECIAL_TOKENS
from unimp_tpu.data.masking import answer_span_labels

__all__ = [
    "UniMPTokenizer",
    "extend_vocabulary",
    "SPECIAL_TOKENS",
    "answer_span_labels",
]
