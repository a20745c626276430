"""Task-weighted masked (focal) cross-entropy.

Exact semantics of the reference training loss
(/root/reference/UniMP/mmrec.py:177-213), verified against a literal
torch re-implementation in tests/test_loss.py:

  * next-token shift: logits[:, :-1] vs labels[:, 1:]
  * per-token CE with ignore_index -100 (labels from answer-span masking)
  * per-sample task weight multiplies each token loss (mmrec.py:199)
  * optional focal reweighting (1 - p_true)^gamma with gradients flowing
    through the focal term, as in the reference (mmrec.py:204-212)
  * normalization by the count of unmasked labels (mmrec.py:213)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unimp_tpu.data.masking import IGNORE


def masked_focal_loss(
    logits: jax.Array,  # [B, T, V] (any float dtype; upcast internally)
    labels: jax.Array,  # [B, T] with IGNORE outside answer spans
    weights: jax.Array,  # [B] per-sample task weights
    gamma: float = 2.0,
    use_reweight: bool = False,
):
    """Returns (scalar loss, dict of aux metrics)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    lab = labels[:, 1:]
    valid = lab != IGNORE
    lab_safe = jnp.where(valid, lab, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, lab_safe[..., None], axis=-1)[..., 0]
    loss_tok = weights[:, None] * ce
    if use_reweight:
        pt = jnp.exp(-ce)  # == softmax(logits)[label]; grad flows through
        loss_tok = loss_tok * (1.0 - pt) ** gamma
    loss_tok = jnp.where(valid, loss_tok, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(loss_tok) / denom
    aux = {
        "ce": jnp.sum(jnp.where(valid, ce, 0.0)) / denom,
        "n_answer_tokens": jnp.sum(valid),
        "accuracy": jnp.sum(
            jnp.where(valid, (jnp.argmax(shift_logits, -1) == lab_safe), 0)
        )
        / denom,
    }
    return loss, aux
