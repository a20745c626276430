"""Decode tests: greedy parity, beam-search vs slow HF-style reference,
and batching/padding invariance of the left-aligned KV window."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.decode import GenerationConfig, Generator
from unimp_tpu.models import UniMPModel, get_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = get_config("debug", dtype="float32")
    model = UniMPModel(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((1, 8), jnp.int32).at[0, 1].set(7)
    img = cfg.vision.image_size
    vision = jnp.zeros((1, 1, img, img, 3), jnp.float32)
    from unimp_tpu.models import compute_q_media

    params = model.init(
        rng, ids, vision_x=vision, q_media=compute_q_media(ids, 7)
    )["params"]
    return cfg, model, params


def _full_logits(model, params, ids):
    logits, _ = model.apply({"params": params}, ids)
    return logits


@pytest.mark.slow
def test_greedy_matches_uncached_rollout(model_and_params):
    cfg, model, params = model_and_params
    rng = np.random.default_rng(0)
    prompt = rng.integers(10, cfg.lm.vocab_size, size=(2, 12)).astype(np.int32)
    seq_len = np.array([12, 12], np.int32)
    max_new = 6

    gen = Generator(
        model, GenerationConfig(max_new_tokens=max_new, eos_id=3, pad_id=0),
        media_id=999,
    )
    toks, scores = gen.generate(params, jnp.asarray(prompt), jnp.asarray(seq_len))

    # uncached rollout
    cur = prompt.copy()
    out = []
    done = np.zeros(2, bool)
    for _ in range(max_new):
        logits = np.asarray(_full_logits(model, params, jnp.asarray(cur)))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        nxt = np.where(done, 0, nxt)
        out.append(nxt)
        done |= nxt == 3
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    want = np.stack(out, axis=1)
    np.testing.assert_array_equal(np.asarray(toks)[:, 0, :], want)


def _reference_beam(model, params, prompt, k, max_new, eos_id, lp=1.0,
                    early_stopping=True):
    """Slow classic-HF beam search on full (uncached) forwards, numpy.

    Literal port of the transformers<4.50 BeamSearchScorer semantics the
    reference ran under (process/is_done/finalize, incl. the
    early_stopping=False improvement heuristic and finalize's
    score-competition between banked and running hypotheses)."""
    prompt = list(prompt)
    plen = len(prompt)
    alive = [(0.0, [])]  # (sum_logprob, generated)
    finished = []  # (norm_score, generated)
    done = False

    for step in range(max_new):
        # candidate expansion
        cands = []
        for score, gen_toks in alive:
            ids = jnp.asarray([prompt + gen_toks], jnp.int32)
            logits = np.asarray(_full_logits(model, params, ids))[0, -1]
            logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
            for tok in np.argsort(-logp)[: 2 * k]:
                cands.append((score + float(logp[tok]), int(tok), gen_toks))
        cands.sort(key=lambda c: -c[0])
        cands = cands[: 2 * k]
        new_alive = []
        for rank, (score, tok, gen_toks) in enumerate(cands):
            if tok == eos_id:
                if rank < k:
                    finished.append((score / (plen + step) ** lp, gen_toks))
            else:
                if len(new_alive) < k:
                    new_alive.append((score, gen_toks + [tok]))
        alive = new_alive
        finished = sorted(finished, key=lambda f: -f[0])[:k]
        # BeamHypotheses.is_done
        if len(finished) >= k:
            if early_stopping:
                done = True
            else:
                best_running = max(s for s, _ in alive) / (
                    (plen + step + 1) ** lp
                )
                done = finished[-1][0] >= best_running
        if done:
            break
    if not done:
        # finalize: running beams compete by normalized score (add()
        # drops the worst hypothesis when over capacity)
        for score, gen_toks in alive:
            finished.append((score / (plen + max_new) ** lp, gen_toks))
    finished.sort(key=lambda f: -f[0])
    return finished[:k]


@pytest.mark.parametrize(
    "lp,early", [(1.0, True), (1.0, False), (0.6, False), (1.8, True)]
)
def test_beam_matches_reference(model_and_params, lp, early):
    cfg, model, params = model_and_params
    rng = np.random.default_rng(1)
    k, max_new = 4, 5
    prompt = rng.integers(10, cfg.lm.vocab_size, size=(1, 10)).astype(np.int32)
    # pick an eos that actually appears: run greedy first, take its 3rd token
    gen_probe = Generator(
        model, GenerationConfig(max_new_tokens=3, eos_id=1, pad_id=0),
        media_id=999,
    )
    probe, _ = gen_probe.generate(
        params, jnp.asarray(prompt), jnp.asarray([10], np.int32)
    )
    eos_id = int(np.asarray(probe)[0, 0, 2])

    gen = Generator(
        model,
        GenerationConfig(
            max_new_tokens=max_new, eos_id=eos_id, pad_id=0, num_beams=k,
            num_return_sequences=k, length_penalty=lp, early_stopping=early,
        ),
        media_id=999,
    )
    toks, scores = gen.generate(
        params, jnp.asarray(prompt), jnp.asarray([10], np.int32)
    )
    got = [
        [t for t in np.asarray(toks)[0, i].tolist() if t != 0]
        for i in range(k)
    ]
    got_scores = np.asarray(scores)[0]

    want = _reference_beam(model, params, prompt[0].tolist(), k, max_new,
                           eos_id, lp=lp, early_stopping=early)
    want_seqs = [w[1] for w in want]
    want_scores = [w[0] for w in want]
    assert got == want_seqs, (got, want_seqs)
    np.testing.assert_allclose(got_scores, want_scores, atol=2e-3, rtol=2e-3)


def test_padding_invariance(model_and_params):
    """A short prompt decoded alone == same prompt batched with longer ones."""
    cfg, model, params = model_and_params
    rng = np.random.default_rng(2)
    short = rng.integers(10, cfg.lm.vocab_size, size=8).astype(np.int32)
    long_ = rng.integers(10, cfg.lm.vocab_size, size=16).astype(np.int32)

    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=4, eos_id=3, pad_id=0, num_beams=3,
                         num_return_sequences=3),
        media_id=999,
    )
    # batched: short padded to 16
    ids = np.zeros((2, 16), np.int32)
    ids[0, :8] = short
    ids[1] = long_
    toks_b, scores_b = gen.generate(
        params, jnp.asarray(ids), jnp.asarray([8, 16], np.int32)
    )
    # solo
    toks_s, scores_s = gen.generate(
        params, jnp.asarray(short[None]), jnp.asarray([8], np.int32)
    )
    np.testing.assert_array_equal(np.asarray(toks_b)[0], np.asarray(toks_s)[0])
    np.testing.assert_allclose(
        np.asarray(scores_b)[0], np.asarray(scores_s)[0], atol=2e-4, rtol=2e-4
    )


@pytest.mark.slow
def test_multimodal_generate_runs(model_and_params):
    cfg, model, params = model_and_params
    rng = np.random.default_rng(3)
    b, m, img = 2, 2, cfg.vision.image_size
    vision = rng.normal(size=(b, m, img, img, 3)).astype(np.float32)
    ids = rng.integers(10, cfg.lm.vocab_size, size=(b, 12)).astype(np.int32)
    ids[:, 1] = 7  # media token
    ids[:, 6] = 7
    latents = model.apply(
        {"params": params}, jnp.asarray(vision), method=UniMPModel.encode_vision
    )
    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=4, eos_id=3, pad_id=0, num_beams=2,
                         num_return_sequences=2),
        media_id=7,
    )
    toks, scores = gen.generate(
        params, jnp.asarray(ids), jnp.asarray([12, 12], np.int32), latents
    )
    assert toks.shape == (2, 2, 4)
    assert np.isfinite(np.asarray(scores)).all()


def test_sampling_modes(model_and_params):
    cfg, model, params = model_and_params
    rng = np.random.default_rng(5)
    prompt = rng.integers(10, cfg.lm.vocab_size, size=(2, 10)).astype(np.int32)
    seq_len = np.array([10, 10], np.int32)

    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=6, eos_id=1, pad_id=0,
                         temperature=1.0, top_k=20, top_p=0.9),
        media_id=999,
    )
    t1, _ = gen.generate(params, jnp.asarray(prompt), jnp.asarray(seq_len),
                         rng=jax.random.PRNGKey(0))
    t2, _ = gen.generate(params, jnp.asarray(prompt), jnp.asarray(seq_len),
                         rng=jax.random.PRNGKey(1))
    assert t1.shape == (2, 1, 6)
    # different seeds should (overwhelmingly) differ somewhere
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))
    # same seed reproduces
    t3, _ = gen.generate(params, jnp.asarray(prompt), jnp.asarray(seq_len),
                         rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t3))


def test_streaming_generator_matches_batch_greedy(model_and_params):
    from unimp_tpu.tools import synth_data
    import tempfile

    cfg, model, params = model_and_params

    class _Tok:
        eos_token_id = 3
        media_token_id = 7

        def encode(self, text, add_bos=False, add_eos=False):
            ids = [int(w) for w in text.split()]
            return ([2] + ids) if add_bos else ids

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    from unimp_tpu.decode.streaming import StreamingGenerator

    tok = _Tok()
    prompt_ids = [int(x) for x in np.random.default_rng(0).integers(
        10, cfg.lm.vocab_size, size=9)]
    prompt = " ".join(str(i) for i in prompt_ids)

    streamer = StreamingGenerator(model, tok, max_new_tokens=5)
    texts = list(streamer.stream(params, prompt))
    assert texts, "no tokens streamed"
    streamed = [int(x) for x in texts[-1].split()]

    gen = Generator(
        model, GenerationConfig(max_new_tokens=5, eos_id=3, pad_id=0),
        media_id=7,
    )
    full = np.asarray([2] + prompt_ids, np.int32)[None]
    toks, _ = gen.generate(params, jnp.asarray(full),
                           jnp.asarray([len(prompt_ids) + 1], np.int32))
    want = [t for t in np.asarray(toks)[0, 0].tolist() if t != 0]
    # the batch generator records the eos token; streaming stops before it
    want_no_eos = [t for t in want if t != 3]
    assert streamed == want_no_eos


# ---------------------------------------------------------------- chunked op


def _rand_decode_case(rng, b, k_beams, t, g, h, d, alibi=False):
    # heads-major cache layout (see models.lm.init_gen_cache)
    keys = jax.random.split(rng, 7)
    bk = b * k_beams
    q = jax.random.normal(keys[0], (bk, h, d), jnp.float32)
    pk = jax.random.normal(keys[1], (b, h, t, d), jnp.float32)
    pv = jax.random.normal(keys[2], (b, h, t, d), jnp.float32)
    gk = jax.random.normal(keys[3], (bk, h, g, d), jnp.float32)
    gv = jax.random.normal(keys[4], (bk, h, g, d), jnp.float32)
    kv_start = jax.random.randint(keys[5], (b,), 0, t // 2)
    sel = jax.random.randint(keys[6], (bk, g), 0, k_beams)
    slopes = (
        jnp.linspace(0.1, 1.0, h, dtype=jnp.float32) if alibi else None
    )
    return q, pk, pv, gk, gv, kv_start, sel, slopes


@pytest.mark.slow
@pytest.mark.parametrize("step", [1, 7, 16, 37, 50])
@pytest.mark.parametrize("use_beam_sel", [True, False])
def test_chunked_gen_segment_matches_full_read(step, use_beam_sel):
    """The dynamic-trip chunked gen-cache read (gen_chunk=16) must be
    numerically identical to the full-width read at every fill level,
    including the clamped/overlapping final chunk (G=50 is not a chunk
    multiple)."""
    from unimp_tpu.ops.decode_attention import decode_attention

    b, k_beams, t, g, h, d = 2, 3, 12, 50, 4, 16
    q, pk, pv, gk, gv, kv_start, sel, slopes = _rand_decode_case(
        jax.random.PRNGKey(step), b, k_beams, t, g, h, d,
        alibi=use_beam_sel,  # exercise alibi on one arm of the matrix
    )
    kw = dict(
        step=jnp.int32(step), kv_start=kv_start, alibi=slopes,
        beam_sel=sel if use_beam_sel else None,
    )
    full = decode_attention(q, pk, pv, gk, gv, gen_chunk=0, **kw)
    chunked = decode_attention(q, pk, pv, gk, gv, gen_chunk=16, **kw)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=2e-5, atol=2e-5
    )


def test_chunked_gen_segment_inside_jit_traced_step():
    """gen_chunk's dynamic trip count must compile inside a jitted loop
    with a TRACED step (the sampler's while_loop carries step)."""
    from unimp_tpu.ops.decode_attention import decode_attention

    b, k_beams, t, g, h, d = 1, 2, 8, 40, 2, 8
    q, pk, pv, gk, gv, kv_start, sel, _ = _rand_decode_case(
        jax.random.PRNGKey(0), b, k_beams, t, g, h, d
    )

    @jax.jit
    def run(step):
        return decode_attention(
            q, pk, pv, gk, gv, step=step, kv_start=kv_start,
            beam_sel=sel, gen_chunk=8,
        )

    for s in (1, 9, 40):
        ref = decode_attention(
            q, pk, pv, gk, gv, step=jnp.int32(s), kv_start=kv_start,
            beam_sel=sel, gen_chunk=0,
        )
        np.testing.assert_allclose(
            np.asarray(run(jnp.int32(s))), np.asarray(ref),
            rtol=2e-5, atol=2e-5,
        )


def test_gen_chunk_auto_prefers_full_width(monkeypatch):
    """gen_chunk=None auto dispatch: full-width reads for ordinary gen
    widths (the chunked walk's dynamic trip count costs ~20 ms/step in
    scalar sync at 4b shapes, measured round 4), chunked only for wide
    caches (G > 128); UNIMP_DECODE_GEN_CHUNK overrides both ways."""
    import unimp_tpu.ops.decode_attention as da

    calls = []
    real = da._chunked_gen_segment

    def spy(*args, **kwargs):
        calls.append(args[-1])  # chunk size is the last positional arg
        return real(*args, **kwargs)

    monkeypatch.setattr(da, "_chunked_gen_segment", spy)

    def run(g, env=None):
        if env is None:
            monkeypatch.delenv("UNIMP_DECODE_GEN_CHUNK", raising=False)
        else:
            monkeypatch.setenv("UNIMP_DECODE_GEN_CHUNK", env)
        b, k_beams, t, h, d = 1, 2, 8, 2, 8
        q, pk, pv, gk, gv, kv_start, sel, _ = _rand_decode_case(
            jax.random.PRNGKey(0), b, k_beams, t, g, h, d
        )
        calls.clear()
        da.decode_attention(q, pk, pv, gk, gv, step=jnp.int32(2),
                            kv_start=kv_start, beam_sel=sel, impl="xla")
        return list(calls)

    assert run(50) == []            # ordinary width -> full-width read
    assert run(160) == [16]         # wide cache -> chunked walk
    assert run(160, env="0") == []  # env forces full-width
    assert run(50, env="8") == [8]  # env forces chunking


# ------------------------------------------------------- fused pallas kernel


@pytest.mark.parametrize("step", [1, 13, 50])
@pytest.mark.parametrize("mode", ["beam", "beam_alibi", "greedy", "gqa"])
def test_pallas_decode_attention_matches_xla(step, mode):
    """The fused heads-major Pallas kernel must match the XLA split-cache
    path bit-for-bit in semantics (same masks, ancestry, merge) across
    beam/greedy/ALiBi/GQA at every cache fill level."""
    from unimp_tpu.ops.decode_attention import decode_attention
    from unimp_tpu.ops.decode_attention_pallas import pallas_decode_attention

    b, k_beams, t, g, h, d = 2, 3, 16, 50, 4, 16
    hkv = 2 if mode == "gqa" else h
    if mode == "greedy":
        k_beams = 1
    rng = jax.random.PRNGKey(step)
    keys = jax.random.split(rng, 7)
    bk = b * k_beams
    q = jax.random.normal(keys[0], (bk, h, d), jnp.float32)
    pk = jax.random.normal(keys[1], (b, hkv, t, d), jnp.float32)
    pv = jax.random.normal(keys[2], (b, hkv, t, d), jnp.float32)
    gk = jax.random.normal(keys[3], (bk, hkv, g, d), jnp.float32)
    gv = jax.random.normal(keys[4], (bk, hkv, g, d), jnp.float32)
    kv_start = jax.random.randint(keys[5], (b,), 0, t // 2)
    sel = (jax.random.randint(keys[6], (bk, g), 0, k_beams)
           if k_beams > 1 else None)
    slopes = (jnp.linspace(0.1, 1.0, h, dtype=jnp.float32)
              if mode == "beam_alibi" else None)

    ref = decode_attention(
        q, pk, pv, gk, gv, step=jnp.int32(step), kv_start=kv_start,
        alibi=slopes, beam_sel=sel, gen_chunk=0, impl="xla",
    )
    got = pallas_decode_attention(
        q, pk, pv, gk, gv,
        step=jnp.int32(step), kv_start=kv_start, alibi=slopes,
        beam_sel=sel,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pallas_decode_attention_prompt_len_and_jit():
    """prompt_len masking + traced step under jit (the sampler's loop)."""
    from unimp_tpu.ops.decode_attention import decode_attention
    from unimp_tpu.ops.decode_attention_pallas import pallas_decode_attention

    b, k_beams, t, g, h, d = 1, 2, 8, 24, 2, 8
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 7)
    bk = b * k_beams
    q = jax.random.normal(keys[0], (bk, h, d), jnp.float32)
    pk = jax.random.normal(keys[1], (b, h, t, d), jnp.float32)
    pv = jax.random.normal(keys[2], (b, h, t, d), jnp.float32)
    gk = jax.random.normal(keys[3], (bk, h, g, d), jnp.float32)
    gv = jax.random.normal(keys[4], (bk, h, g, d), jnp.float32)
    plen = jnp.asarray([6], jnp.int32)
    sel = jax.random.randint(keys[6], (bk, g), 0, k_beams)

    @jax.jit
    def run(step):
        return pallas_decode_attention(
            q, pk, pv, gk, gv,
            step=step, prompt_len=plen, beam_sel=sel,
        )

    for s in (1, 9, 24):
        ref = decode_attention(
            q, pk, pv, gk, gv, step=jnp.int32(s), prompt_len=plen,
            beam_sel=sel, gen_chunk=0, impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(run(jnp.int32(s))), np.asarray(ref),
            rtol=2e-5, atol=2e-5,
        )


@pytest.mark.parametrize("kb,gqa", [(1, False), (3, False), (3, True)])
def test_pallas_single_query_attention_matches_xla(kb, gqa):
    """The prompt-only fused kernel (gated-xattn decode) must match the
    XLA path incl. GQA, arbitrary boolean masks, and all-masked rows
    (no-media batch rows attend to nothing and return zeros)."""
    from unimp_tpu.ops.decode_attention import single_query_attention
    from unimp_tpu.ops.decode_attention_pallas import (
        pallas_single_query_attention,
    )

    b, s, h, d = 3, 24, 4, 16
    hkv = 2 if gqa else h
    bk = b * kb
    rng = jax.random.PRNGKey(kb)
    keys = jax.random.split(rng, 4)
    q = jax.random.normal(keys[0], (bk, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
    mask = jax.random.bernoulli(keys[3], 0.7, (b, s))
    mask = mask.at[0].set(False)  # row with no media latents at all

    ref = single_query_attention(q, k, v, mask, impl="xla")
    got = pallas_single_query_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_model_decode_with_pallas_impl_matches_xla(model_and_params,
                                                   monkeypatch):
    """End-to-end beam generate with UNIMP_DECODE_IMPL=pallas (interpret
    mode on CPU) must produce the same beams as the XLA dispatch — the
    integration check for the fused kernels behind the full layers path
    (heads-major caches, xattn latents, left-aligned prompts, ragged
    lengths)."""
    cfg, model, params = model_and_params
    rng = np.random.default_rng(11)
    b, m, img = 2, 2, cfg.vision.image_size
    vision = rng.normal(size=(b, m, img, img, 3)).astype(np.float32)
    ids = rng.integers(10, cfg.lm.vocab_size, size=(b, 12)).astype(np.int32)
    ids[:, 1] = 7
    ids[:, 6] = 7
    seq_len = jnp.asarray([12, 9], np.int32)  # ragged: row 1 is shorter
    latents = model.apply(
        {"params": params}, jnp.asarray(vision), method=UniMPModel.encode_vision
    )
    gcfg = GenerationConfig(max_new_tokens=5, eos_id=3, pad_id=0,
                            num_beams=3, num_return_sequences=3)

    outs = {}
    for impl in ("xla", "pallas"):
        monkeypatch.setenv("UNIMP_DECODE_IMPL", impl)
        gen = Generator(model, gcfg, media_id=7)
        toks, scores = gen.generate(params, jnp.asarray(ids), seq_len, latents)
        outs[impl] = (np.asarray(toks), np.asarray(scores))
    np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
    np.testing.assert_allclose(outs["xla"][1], outs["pallas"][1],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("step", [1, 29])
def test_pallas_decode_attention_int8_matches_xla(step):
    """int8 KV caches with in-kernel dequant (scales fold into logits /
    softmax weights) must match the XLA dequantize-then-attend path."""
    from unimp_tpu.decode.sampler import quantize_kv_cache
    from unimp_tpu.ops.decode_attention import decode_attention

    b, k_beams, t, g, h, d = 2, 3, 16, 32, 4, 16
    rng = jax.random.PRNGKey(step)
    keys = jax.random.split(rng, 7)
    bk = b * k_beams
    q = jax.random.normal(keys[0], (bk, h, d), jnp.float32)
    prompt = quantize_kv_cache({
        "k": jax.random.normal(keys[1], (b, h, t, d), jnp.float32),
        "v": jax.random.normal(keys[2], (b, h, t, d), jnp.float32),
    })
    gen = quantize_kv_cache({
        "k": jax.random.normal(keys[3], (bk, h, g, d), jnp.float32),
        "v": jax.random.normal(keys[4], (bk, h, g, d), jnp.float32),
    })
    kv_start = jax.random.randint(keys[5], (b,), 0, t // 2)
    sel = jax.random.randint(keys[6], (bk, g), 0, k_beams)

    kwargs = dict(
        step=jnp.int32(step), kv_start=kv_start, beam_sel=sel,
        prompt_k_scale=prompt["k_scale"], prompt_v_scale=prompt["v_scale"],
        gen_k_scale=gen["k_scale"], gen_v_scale=gen["v_scale"],
    )
    ref = decode_attention(q, prompt["k"], prompt["v"], gen["k"], gen["v"],
                           gen_chunk=0, impl="xla", **kwargs)
    got = decode_attention(q, prompt["k"], prompt["v"], gen["k"], gen["v"],
                           impl="pallas", **kwargs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    # and against the unquantized ground truth: dequant error only
    pk = prompt["k"].astype(jnp.float32) * prompt["k_scale"][..., None]
    pv = prompt["v"].astype(jnp.float32) * prompt["v_scale"][..., None]
    gk = gen["k"].astype(jnp.float32) * gen["k_scale"][..., None]
    gv = gen["v"].astype(jnp.float32) * gen["v_scale"][..., None]
    full = decode_attention(q, pk, pv, gk, gv, gen_chunk=0, impl="xla",
                            step=jnp.int32(step), kv_start=kv_start,
                            beam_sel=sel)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(full), rtol=2e-2, atol=2e-2
    )


def test_pallas_single_query_attention_int8_matches_xla():
    from unimp_tpu.decode.sampler import quantize_kv_cache
    from unimp_tpu.ops.decode_attention import single_query_attention

    b, kb, s, h, d = 2, 3, 24, 4, 16
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 4)
    q = jax.random.normal(keys[0], (b * kb, h, d), jnp.float32)
    kv = quantize_kv_cache({
        "k": jax.random.normal(keys[1], (b, h, s, d), jnp.float32),
        "v": jax.random.normal(keys[2], (b, h, s, d), jnp.float32),
    })
    mask = jax.random.bernoulli(keys[3], 0.7, (b, s))

    ref = single_query_attention(q, kv["k"], kv["v"], mask,
                                 k_scale=kv["k_scale"],
                                 v_scale=kv["v_scale"], impl="xla")
    got = single_query_attention(q, kv["k"], kv["v"], mask,
                                 k_scale=kv["k_scale"],
                                 v_scale=kv["v_scale"], impl="pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


@pytest.mark.slow
def test_model_decode_kv_int8_pallas_impl(model_and_params, monkeypatch):
    """kv_int8 generate under the pallas pin: in-kernel dequant must keep
    the beams the XLA int8 dispatch produces."""
    cfg, model, params = model_and_params
    rng = np.random.default_rng(17)
    b, m, img = 2, 2, cfg.vision.image_size
    vision = rng.normal(size=(b, m, img, img, 3)).astype(np.float32)
    ids = rng.integers(10, cfg.lm.vocab_size, size=(b, 12)).astype(np.int32)
    ids[:, 1] = 7
    ids[:, 6] = 7
    seq_len = jnp.asarray([12, 10], np.int32)
    latents = model.apply(
        {"params": params}, jnp.asarray(vision), method=UniMPModel.encode_vision
    )
    gcfg = GenerationConfig(max_new_tokens=5, eos_id=3, pad_id=0,
                            num_beams=3, num_return_sequences=3,
                            kv_int8=True)
    outs = {}
    for impl in ("xla", "pallas"):
        monkeypatch.setenv("UNIMP_DECODE_IMPL", impl)
        gen = Generator(model, gcfg, media_id=7)
        toks, scores = gen.generate(params, jnp.asarray(ids), seq_len, latents)
        outs[impl] = (np.asarray(toks), np.asarray(scores))
    np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
    np.testing.assert_allclose(outs["xla"][1], outs["pallas"][1],
                               rtol=1e-3, atol=1e-3)


def test_kv_int8_pins_pallas_dispatch(model_and_params, monkeypatch):
    """kv_int8 must auto-pin the Pallas decode impl on a single TPU
    device (under XLA the dequantized cache copies materialize —
    measured ~25% slower at 4b), must NOT pin on CPU/GPU backends
    (there "pallas" means interpret mode, orders of magnitude slower;
    ADVICE r4), and must warn when a >1-device mesh forces XLA."""
    import unimp_tpu.decode.sampler as sampler_mod

    cfg, model, params = model_and_params
    monkeypatch.delenv("UNIMP_DECODE_IMPL", raising=False)
    gcfg = GenerationConfig(max_new_tokens=4, eos_id=3, pad_id=0,
                            kv_int8=True)
    # this suite runs on CPU: the auto-pin must stay off here ...
    gen_cpu = Generator(model, gcfg, media_id=7)
    assert gen_cpu.attn_impl is None
    # ... and engage on a TPU backend
    monkeypatch.setattr(sampler_mod.jax, "default_backend", lambda: "tpu")
    gen = Generator(model, gcfg, media_id=7)
    assert gen.attn_impl == "pallas"

    # bf16 caches keep the measured default (auto -> xla inside the ops)
    gen_bf16 = Generator(
        model, dataclasses.replace(gcfg, kv_int8=False), media_id=7
    )
    assert gen_bf16.attn_impl is None

    # explicit env pin wins over the kv_int8 auto-pin
    monkeypatch.setenv("UNIMP_DECODE_IMPL", "xla")
    gen_pin = Generator(model, gcfg, media_id=7)
    assert gen_pin.attn_impl is None
    monkeypatch.delenv("UNIMP_DECODE_IMPL", raising=False)

    # multi-device mesh: XLA impl stays (no Pallas SPMD rule) + loud warn
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2]).reshape(2, 1, 1)
    mesh = Mesh(devs, ("dp", "fsdp", "tp"))
    with pytest.warns(UserWarning, match="kv_int8"):
        gen_mesh = Generator(model, gcfg, media_id=7, mesh=mesh)
    assert gen_mesh.attn_impl == "xla"


def test_batched_engine_kv_int8_pins_pallas(monkeypatch):
    from unimp_tpu.serve.batching import BatchedStreamingEngine

    monkeypatch.delenv("UNIMP_DECODE_IMPL", raising=False)

    class _Tok:
        eos_token_id = 3
        pad_token_id = 0

    # CPU backend (this suite): no auto-pin — interpret-mode Pallas
    # would be orders of magnitude slower (ADVICE r4)
    eng_cpu = BatchedStreamingEngine(None, _Tok(), kv_int8=True)
    assert eng_cpu.attn_impl is None
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    eng = BatchedStreamingEngine(None, _Tok(), kv_int8=True)
    assert eng.attn_impl == "pallas"
    eng_bf16 = BatchedStreamingEngine(None, _Tok(), kv_int8=False)
    assert eng_bf16.attn_impl is None
