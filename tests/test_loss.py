"""Loss parity: our jax loss vs a literal torch port of mmrec.py:177-213."""

import numpy as np

from unimp_tpu.train.loss import masked_focal_loss


def _reference_loss_torch(logits, labels, weights, gamma, use_reweight):
    """Literal re-implementation of /root/reference/UniMP/mmrec.py:185-213."""
    import torch

    lm_logits = torch.tensor(logits)
    labels_t = torch.tensor(labels)
    weights_t = torch.tensor(weights)
    n1, n2 = labels_t.shape[0], labels_t.shape[1] - 1
    shift_logits = lm_logits[:, :-1, :].contiguous()
    lab = labels_t[:, 1:].contiguous()
    loss_fct = torch.nn.CrossEntropyLoss(reduction="none")
    shift_logits = shift_logits.view(-1, shift_logits.size(-1))
    lab = lab.view(-1)
    lm_loss = loss_fct(shift_logits, lab).view(n1, n2)
    loss = torch.unsqueeze(weights_t, 1) * lm_loss
    loss = loss.view(-1)
    if use_reweight:
        p = torch.nn.functional.softmax(shift_logits, dim=-1)
        all_rows = torch.arange(len(shift_logits))
        pt = p[all_rows, lab.clamp(min=0)]
        focal = (1 - pt) ** gamma
        # CrossEntropyLoss zeroes ignore_index rows already, so the focal
        # multiply matches the reference exactly.
        loss = loss * focal
    return (torch.sum(loss) / torch.sum(lab != -100)).item()


def test_loss_matches_reference():
    rng = np.random.default_rng(0)
    b, t, v = 3, 24, 50
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, t))
    labels[rng.random(size=(b, t)) < 0.6] = -100
    labels[:, 0] = -100
    weights = np.array([2.0, 1.0, 1.0], np.float32)

    for use_reweight, gamma in [(False, 2.0), (True, 2.0), (True, 0.5)]:
        ours, aux = masked_focal_loss(
            logits, labels, weights, gamma=gamma, use_reweight=use_reweight
        )
        ref = _reference_loss_torch(logits, labels, weights, gamma, use_reweight)
        np.testing.assert_allclose(float(ours), ref, rtol=1e-5)
    assert aux["n_answer_tokens"] == (labels != -100).sum()


def test_loss_all_masked_is_finite():
    logits = np.zeros((1, 4, 10), np.float32)
    labels = np.full((1, 4), -100)
    loss, _ = masked_focal_loss(logits, labels, np.ones(1, np.float32))
    assert float(loss) == 0.0
