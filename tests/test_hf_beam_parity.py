"""Real-HF beam-search parity golden.

The rec/search metrics depend on the EXACT top-10 beam sequences the
reference produces through `transformers` `generate(num_beams=10,
num_return_sequences=10, ...)` over its patched LlamaForCausalLM
(/root/reference/UniMP/pipeline/eval/eval_rec.py:100-110,
xformers_model/llama.py:835-880). This test runs the REAL transformers
beam search on the vendored reference LLaMA classes and asserts our
whole-loop jitted beam decoder (decode/sampler.py) returns the same
top-K token sequences and normalized scores — tie-breaking,
length-penalty timing, early-stopping semantics and all.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.decode import GenerationConfig, Generator
from unimp_tpu.models import UniMPModel
from unimp_tpu.models.config import (
    LMConfig,
    ResamplerConfig,
    UniMPConfig,
    VisionConfig,
)
from unimp_tpu.tools.convert_torch import convert_state_dict

from test_convert import _reference_classes, _tiny_llama_cfg, needs_ref

EOS, PAD = 3, 0


def _build_pair(seed=3):
    """Vendored reference LlamaForCausalLM + our UniMPModel sharing its
    exact weights (forward-parity is separately locked by
    test_convert.test_reference_llama_forward_parity)."""
    import torch
    from transformers import GenerationMixin

    LlamaForCausalLM, _ = _reference_classes()

    # transformers >=4.50 no longer bakes GenerationMixin into
    # PreTrainedModel; graft it onto the vendored (older-API) class so the
    # REAL HF generate drives the reference model's own
    # prepare_inputs_for_generation/_reorder_cache plumbing.
    class _GenLlama(LlamaForCausalLM, GenerationMixin):
        @classmethod
        def _supports_default_dynamic_cache(cls):
            # keep the vendored legacy tuple KV cache + its own
            # _reorder_cache (llama.py:871) in the generate loop
            return False

    torch.manual_seed(seed)
    tl = _GenLlama(_tiny_llama_cfg()).eval()

    cfg = UniMPConfig(
        VisionConfig(image_size=28, patch_size=14, hidden_size=32,
                     num_layers=1, num_heads=2),
        ResamplerConfig(num_latents=4, depth=1, num_heads=2, head_dim=16),
        LMConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                 mlp_hidden=48, norm="rmsnorm", positions="rope", act="silu",
                 parallel_block=False, use_bias=False, tie_embeddings=False,
                 layernorm_eps=1e-5),
        cross_attn_every_n=2, dtype="float32",
    )
    model = UniMPModel(cfg)
    ids0 = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0)["params"]
    sd = {f"lang_encoder.{k}": v.numpy() for k, v in tl.state_dict().items()}
    conv, report = convert_state_dict(sd, params)
    assert report["missed"] == [], report["missed"]
    return tl, model, conv


def _hf_beams(tl, prompts, lens, *, k, max_new, lp, early):
    """Run the real transformers beam search; returns per-row lists of
    (generated tokens up to first EOS, normalized score).

    One generate() call per row at batch 1, exactly the reference eval
    protocol (eval_rec.py:100-110 decodes one user at a time): the
    vendored xformers attention falls back to a top-left-aligned causal
    mask whenever the batch carries padding (llama.py:295-301), so
    padded-batch generate is NOT a semantics the reference ever runs."""
    import torch

    rows = []
    for p, n in zip(prompts, lens):
        ids = torch.tensor(np.asarray(p[:n], np.int64)[None, :])
        with torch.no_grad():
            out = tl.generate(
                input_ids=ids, attention_mask=torch.ones_like(ids),
                num_beams=k, num_return_sequences=k, max_new_tokens=max_new,
                early_stopping=early, length_penalty=lp, do_sample=False,
                eos_token_id=EOS, pad_token_id=PAD,
                return_dict_in_generate=True, output_scores=True,
            )
        seqs = out.sequences.numpy()[:, n:]
        scores = out.sequences_scores.numpy()
        row = []
        for j in range(k):
            toks = []
            for tok in seqs[j]:
                if tok == EOS or tok == PAD:
                    break
                toks.append(int(tok))
            row.append((tuple(toks), float(scores[j])))
        rows.append(row)
    return rows


def _our_beams(model, params, prompts, lens, *, k, max_new, lp, early):
    b = len(prompts)
    t = max(lens)
    ids = np.full((b, t), PAD, np.int32)  # right-padded; sampler left-aligns
    for i, (p, n) in enumerate(zip(prompts, lens)):
        ids[i, :n] = p[:n]
    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=max_new, eos_id=EOS, pad_id=PAD,
                         num_beams=k, num_return_sequences=k,
                         length_penalty=lp, early_stopping=early,
                         length_norm="generated"),
        media_id=999,
    )
    toks, scores = gen.generate(
        params, jnp.asarray(ids), jnp.asarray(np.array(lens, np.int32))
    )
    toks = np.asarray(toks)
    scores = np.asarray(scores)
    rows = []
    for i in range(b):
        row = []
        for j in range(k):
            g = toks[i, j]
            out = []
            for tok in g:
                if tok == EOS or tok == PAD:
                    break
                out.append(int(tok))
            row.append((tuple(out), float(scores[i, j])))
        rows.append(row)
    return rows


@needs_ref
@pytest.mark.parametrize(
    "lp,early", [(1.0, True), (1.0, False), (0.7, True), (2.0, False)]
)
def test_hf_generate_beam_parity(lp, early):
    tl, model, params = _build_pair()
    rng = np.random.default_rng(11)
    # two rows, unequal prompt lengths (exercises the left-align path and
    # HF's left-padding position handling); tokens avoid EOS/PAD
    prompts = [
        rng.integers(4, 64, size=10).astype(np.int64),
        rng.integers(4, 64, size=7).astype(np.int64),
    ]
    lens = [10, 7]
    k, max_new = 10, 8

    hf = _hf_beams(tl, prompts, lens, k=k, max_new=max_new, lp=lp,
                   early=early)
    ours = _our_beams(model, params, prompts, lens, k=k, max_new=max_new,
                      lp=lp, early=early)

    for i in range(len(prompts)):
        hf_toks = [h[0] for h in hf[i]]
        our_toks = [o[0] for o in ours[i]]
        assert hf_toks == our_toks, (
            f"row {i} beam sequences diverge:\nHF:   {hf_toks}\n"
            f"ours: {our_toks}"
        )
        np.testing.assert_allclose(
            [o[1] for o in ours[i]], [h[1] for h in hf[i]],
            rtol=2e-3, atol=2e-3,
            err_msg=f"row {i} beam scores diverge",
        )
