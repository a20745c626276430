"""Vectorized answer-span label masking.

Replaces the reference's O(B·T) Python interpreter loop
(/root/reference/UniMP/mmrec.py:146-168) with a vectorized computation
that runs inside jit on device. Reference semantics, verified by a
golden test against a literal re-implementation of the loop:

  * walk each row with a flag; ``<answer>`` raises it (the token itself
    is masked), ``<|endofchunk|>`` lowers it (itself masked); tokens are
    kept only while the flag is up
  * then mask pad tokens, position 0, all ``<answer>`` and all
    ``<image>`` tokens (mmrec.py:158-168)

Vectorization: a token is inside a span iff the index of the most recent
``<answer>`` strictly before it exceeds the index of the most recent
``<|endofchunk|>`` strictly before it — two inclusive cummax scans
shifted by one. (``<|endofchunk|>`` without a preceding ``<answer>``,
as in img_sel history items, correctly keeps the flag down.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IGNORE = -100


def answer_span_labels(
    input_ids,
    answer_id: int,
    endofchunk_id: int,
    media_id: int,
    pad_id: int,
):
    """[B, T] token ids -> [B, T] labels with IGNORE outside answer spans."""
    ids = input_ids
    b, t = ids.shape
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    ans_idx = jnp.where(ids == answer_id, pos, -1)
    eoc_idx = jnp.where(ids == endofchunk_id, pos, -1)
    last_ans = jax.lax.cummax(ans_idx, axis=1)
    last_eoc = jax.lax.cummax(eoc_idx, axis=1)
    # state *before* each position: shift right by one
    shift = lambda x: jnp.pad(x, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    inside = shift(last_ans) > shift(last_eoc)
    keep = (
        inside
        & (ids != endofchunk_id)
        & (ids != answer_id)
        & (ids != media_id)
        & (ids != pad_id)
        & (pos > 0)
    )
    return jnp.where(keep, ids, IGNORE)


def answer_span_labels_reference(ids, answer_id, endofchunk_id, media_id, pad_id):
    """Literal port of the reference loop (mmrec.py:146-168); test oracle."""
    labels = np.array(ids, copy=True)
    for i in range(labels.shape[0]):
        flag = 0
        for j in range(labels.shape[1]):
            if not flag:
                if labels[i, j] == answer_id:
                    flag = 1
                labels[i, j] = IGNORE
            else:
                if labels[i, j] == endofchunk_id:
                    flag = 0
                    labels[i, j] = IGNORE
    labels[np.array(ids) == pad_id] = IGNORE
    labels[:, 0] = IGNORE
    labels[np.array(ids) == answer_id] = IGNORE
    labels[np.array(ids) == media_id] = IGNORE
    return labels
