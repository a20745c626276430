"""Few-shot vision-language benchmark harness (COCO / VQA / ImageNet).

Capability parity with the inherited OpenFlamingo evaluation harness
(/root/reference/UniMP/pipeline/eval/evaluate.py:168-780 — captioning
with CIDEr, VQA with the official accuracy rule, ImageNet
classification; not exercised by the UniMP task scripts but part of the
framework surface). Datasets are provided as simple JSON manifests
(list of {image, caption/question/answer/label}) so the harness is
storage-agnostic; metrics are implemented hermetically:

  * CIDEr-D for captioning (tf-idf weighted n-gram cosine, as in the
    pycocoevalcap implementation the reference depends on)
  * VQA accuracy: min(#matching human answers / 3, 1)
  * top-1 classification accuracy (rank class names by LM logprob)
"""

from __future__ import annotations

import json
import math
import os
import re
from collections import Counter, defaultdict
from typing import Dict, List, Optional

import numpy as np


# ----------------------------- CIDEr-D -----------------------------


def _caption_tokens(s: str) -> List[str]:
    return re.findall(r"\w+", s.lower())


def _ngram_counts(tokens: List[str], n_max: int = 4):
    out = []
    for n in range(1, n_max + 1):
        out.append(Counter(
            tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        ))
    return out


def cider_d(predictions: List[str], references: List[List[str]],
            n_max: int = 4, sigma: float = 6.0) -> float:
    """Corpus CIDEr-D: tf-idf n-gram cosine with length penalty."""
    # document frequencies over reference sets
    df = [defaultdict(float) for _ in range(n_max)]
    for refs in references:
        seen = [set() for _ in range(n_max)]
        for ref in refs:
            for n, counts in enumerate(_ngram_counts(_caption_tokens(ref), n_max)):
                seen[n].update(counts.keys())
        for n in range(n_max):
            for g in seen[n]:
                df[n][g] += 1.0
    log_m = math.log(max(len(references), 1))

    def tfidf(counts, n):
        vec = {}
        norm = 0.0
        total = max(sum(counts.values()), 1)
        for g, c in counts.items():
            idf = log_m - math.log(max(df[n][g], 1.0))
            v = (c / total) * idf
            vec[g] = v
            norm += v * v
        return vec, math.sqrt(norm)

    scores = []
    for pred, refs in zip(predictions, references):
        p_toks = _caption_tokens(pred)
        p_counts = _ngram_counts(p_toks, n_max)
        score_n = np.zeros(n_max)
        for ref in refs:
            r_toks = _caption_tokens(ref)
            r_counts = _ngram_counts(r_toks, n_max)
            delta = len(p_toks) - len(r_toks)
            for n in range(n_max):
                pv, pn = tfidf(p_counts[n], n)
                rv, rn = tfidf(r_counts[n], n)
                num = sum(min(pv[g], rv.get(g, 0.0)) * rv[g]
                          for g in pv if g in rv)
                if pn > 0 and rn > 0:
                    sim = num / (pn * rn)
                else:
                    sim = 0.0
                sim *= math.exp(-(delta**2) / (2 * sigma**2))
                score_n[n] += sim
        scores.append(10.0 * float(np.mean(score_n / max(len(refs), 1))))
    return float(np.mean(scores)) if scores else 0.0


# ----------------------------- VQA accuracy -----------------------------

# Official VQA normalization + accuracy protocol (contractions table,
# number-word map, punctuation/digit-article passes on prediction AND
# answers, leave-one-out consensus) and the OK-VQA stemmer — see
# unimp_tpu/evals/vqa_normalize.py for the full pipeline and its
# reference citations (vqa_metric.py:218-470, ok_vqa_utils.py:1-214).
from unimp_tpu.evals.vqa_normalize import (  # noqa: F401  (re-exports)
    postprocess_ok_vqa_generation,
    postprocess_vqa_generation,
    vqa_accuracy,
)


# ----------------------------- harness loops -----------------------------


def _load_manifest(path: str) -> List[dict]:
    with open(path) as f:
        return json.load(f)


def _encode_prompt_images(model, params, tokenizer, image_paths, image_size):
    import jax.numpy as jnp

    from unimp_tpu.data.transforms import load_resized_uint8, normalize_on_device

    imgs = np.stack([load_resized_uint8(p, image_size) for p in image_paths])
    vision = normalize_on_device(jnp.asarray(imgs[None]))
    return model.apply(
        {"params": params}, vision, method=type(model).encode_vision
    )


def evaluate_captioning(
    model, params, tokenizer, manifest_path: str, *,
    num_shots: int = 0, image_size: int = 224, max_new_tokens: int = 24,
    limit: Optional[int] = None, seed: int = 0,
) -> Dict[str, float]:
    """manifest: [{"image": path, "captions": [str, ...]}, ...]."""
    import jax.numpy as jnp

    from unimp_tpu.decode import GenerationConfig, Generator

    data = _load_manifest(manifest_path)
    rng = np.random.default_rng(seed)
    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=max_new_tokens,
                         eos_id=tokenizer.eos_token_id,
                         pad_id=tokenizer.eos_token_id, num_beams=3,
                         num_return_sequences=1),
        media_id=tokenizer.media_token_id,
    )
    preds, refs = [], []
    for rec in data[:limit]:
        shots = [data[i] for i in rng.choice(len(data), num_shots, replace=False)]
        prompt = ""
        paths = []
        for s in shots:
            prompt += f"<image> Caption: {s['captions'][0]} <|endofchunk|> "
            paths.append(s["image"])
        prompt += "<image> Caption:"
        paths.append(rec["image"])
        latents = _encode_prompt_images(model, params, tokenizer, paths, image_size)
        ids = tokenizer.encode(prompt)
        toks, _ = gen.generate(
            params, jnp.asarray([ids], jnp.int32),
            jnp.asarray([len(ids)], jnp.int32), latents,
        )
        preds.append(tokenizer.decode(np.asarray(toks)[0, 0]))
        refs.append(rec["captions"])
    return {"cider": cider_d(preds, refs), "n": len(preds)}


def evaluate_vqa(
    model, params, tokenizer, manifest_path: str, *,
    num_shots: int = 0, image_size: int = 224, max_new_tokens: int = 8,
    limit: Optional[int] = None, seed: int = 0, ok_vqa: bool = False,
) -> Dict[str, float]:
    """manifest: [{"image", "question", "answers": [str, ...]}, ...].

    ok_vqa=True applies the OK-VQA stemmer to the prediction (the
    reference routes OK-VQA generations through
    postprocess_ok_vqa_generation, evaluate.py:232-260)."""
    import jax.numpy as jnp

    from unimp_tpu.decode import GenerationConfig, Generator

    data = _load_manifest(manifest_path)
    rng = np.random.default_rng(seed)
    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=max_new_tokens,
                         eos_id=tokenizer.eos_token_id,
                         pad_id=tokenizer.eos_token_id),
        media_id=tokenizer.media_token_id,
    )
    accs = []
    for rec in data[:limit]:
        shots = [data[i] for i in rng.choice(len(data), num_shots, replace=False)]
        prompt = ""
        paths = []
        for s in shots:
            prompt += (f"<image> Question: {s['question']} "
                       f"Answer: {s['answers'][0]} <|endofchunk|> ")
            paths.append(s["image"])
        prompt += f"<image> Question: {rec['question']} Answer:"
        paths.append(rec["image"])
        latents = _encode_prompt_images(model, params, tokenizer, paths, image_size)
        ids = tokenizer.encode(prompt)
        toks, _ = gen.generate(
            params, jnp.asarray([ids], jnp.int32),
            jnp.asarray([len(ids)], jnp.int32), latents,
        )
        pred = tokenizer.decode(np.asarray(toks)[0, 0])
        pred = (postprocess_ok_vqa_generation(pred) if ok_vqa
                else postprocess_vqa_generation(pred))
        accs.append(vqa_accuracy(pred, rec["answers"]))
    return {"vqa_accuracy": float(np.mean(accs)) if accs else 0.0, "n": len(accs)}


def evaluate_classification(
    model, params, tokenizer, manifest_path: str, class_names: List[str], *,
    image_size: int = 224, limit: Optional[int] = None,
) -> Dict[str, float]:
    """Rank class names by the summed LM logprob of "<image> A photo of
    {name}" (reference imagenet protocol, evaluate.py:731-780)."""
    import jax
    import jax.numpy as jnp

    from unimp_tpu.models.flamingo import compute_q_media

    data = _load_manifest(manifest_path)

    @jax.jit
    def score(params, ids, latents, q_media):  # params passed, not closed
        logits, _ = model.apply(
            {"params": params}, ids, latents=latents, q_media=q_media
        )
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        tok_lp = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        mask = (tgt != tokenizer.pad_token_id).astype(jnp.float32)
        return jnp.sum(tok_lp * mask, axis=1)

    prompts = [f"<image> A photo of {name}" for name in class_names]
    enc = [tokenizer.encode(p) for p in prompts]
    width = max(len(e) for e in enc)
    ids = np.full((len(enc), width), tokenizer.pad_token_id, np.int32)
    for i, e in enumerate(enc):
        ids[i, : len(e)] = e
    ids = jnp.asarray(ids)
    q_media = compute_q_media(ids, tokenizer.media_token_id)

    correct = 0
    total = 0
    for rec in data[:limit]:
        latents = _encode_prompt_images(
            model, params, tokenizer, [rec["image"]], image_size
        )
        lat = jnp.repeat(latents, len(class_names), axis=0)
        s = score(params, ids, lat, q_media)
        if int(jnp.argmax(s)) == int(rec["label"]):
            correct += 1
        total += 1
    return {"top1": correct / max(total, 1), "n": total}
