"""unimp_tpu — a TPU-native unified multi-modal personalization framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of UniMP
("Towards Unified Multi-Modal Personalization", ICLR 2024): one
Flamingo-style vision-language model serving five personalization tasks
(sequential recommendation, personalized search, preference/explanation,
image selection, image generation) via next-token generation over an
extended vocabulary.

Design (TPU-first, not a port):
  - ``ops``      Pallas flash-attention kernels (causal / bidirectional /
                 media-masked cross) + XLA reference implementations.
  - ``models``   Flax modules: CLIP-ViT vision tower, perceiver resampler,
                 gated cross-attention causal LM, and the unified model.
  - ``parallel`` Mesh construction and sharding rules (DP/FSDP/TP axes,
                 XLA collectives over ICI instead of NCCL).
  - ``data``     Hermetic tokenizer, task prompt builders matching the
                 reference RecDataset semantics, batch collation, and the
                 vectorized answer-span label masking.
  - ``train``    Focal/task-weighted masked CE, optax optimizer groups,
                 jitted+sharded train step, Orbax checkpointing.
  - ``decode``   KV-cached greedy/beam-search generation loops.
  - ``evals``    Per-task evaluators + rank metrics (HR/NDCG/MRR etc.).
  - ``cli``      Entry points mirroring the reference mmrec.py /
                 mmrec_eval.py / mmrec_prefix.py CLI surface.
  - ``serve``    Controller/worker serving stack.
  - ``tools``    Dataset preprocessing and checkpoint conversion.
"""

__version__ = "0.1.0"
