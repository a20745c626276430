"""Composed-pipeline quality parity: reference torch stack vs unimp-tpu.

Burns down the north star's "HR/NDCG within 1%" clause (BASELINE.md) as
far as this sandbox allows: the SAME tiny model is trained through BOTH
stacks from the SAME converted initial weights on the SAME materialized
token batches in the same order, then both eval protocols run and the
rank metrics are compared.

torch side (the oracle — the reference's own code wherever it exists):
  model      /root/reference/UniMP/xformers_model/llama.py, vendored via
             tests/test_convert._reference_classes (xformers stubbed
             with exact plain-torch attention)
  labels     data.masking.answer_span_labels_reference — literal port of
             the training masking loop (recommender.py:139-160)
  loss       weighted masked CE, mmrec.py:177-213 semantics
  optimizer  torch AdamW, reference grouping (recommender.py:521-543:
             weight decay only on gated-xattn params, i.e. none here) +
             clip_grad_norm_ 1.0 + constant-with-warmup schedule
  eval       the REAL installed `transformers` generate(num_beams=10,
             num_return_sequences=10, early_stopping=True), one user at
             a time — the reference protocol (eval_rec.py:100-110)

jax side (the product, end to end):
  tools/synth_data -> data/{dataset,prompts,tokenizer,collate,loader}
  -> train/loss.py + train/optimizer.py (jitted step)
  -> evals/evaluators.evaluate_rec (batched beam decode through
     decode/sampler.py) -> evals/metrics.py

Text-only: open_flamingo (the reference's vision wrapper) is not
installed in this sandbox, so the torch oracle is the bare reference
LLaMA; with no media in the batch our model's vision/xattn path is
skipped exactly (models/flamingo.py:236) and both sides are the same
mathematical function. Vision/xattn forward parity is locked separately
(tests/test_convert.py). Beam length-norm runs under the installed
transformers convention on both sides (length_norm="generated"); the
classic convention the reference shipped with is locked by
tests/test_decode.py's oracle.

Usage: python benchmarks/parity_check.py [--steps N] [--out record.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

# CPU-only protocol (torch oracle runs on CPU; the comparison must not
# race TPU benchmark jobs) — force the cpu platform BEFORE any backend
# initializes, exactly like tests/conftest.py (the sandbox sitecustomize
# pins the remote-TPU "axon" backend otherwise).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (ROOT, os.path.join(ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

EVAL_MAX_NEW = 6  # both sides; the answer is one atomic item token


def build_data(tmp, *, n_items, n_users, steps, batch_size, seed=0,
               tasks=("rec",)):
    """Synthetic dataset -> tokenizer -> materialized token batches.

    tasks: training mixture, final task last — lists reproduce the
    reference's multi-task mixing with 25% subsampling of every
    non-final task (rec_dataset.py:180-206). Eval always runs the rec
    protocol on the test split."""
    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.data.tokenizer import UniMPTokenizer
    from unimp_tpu.data.vocab import extend_vocabulary
    from unimp_tpu.tools import synth_data

    synth_data.generate(tmp, n_items=n_items, n_users=n_users,
                        image_size=28, seed=seed, write_images=False)
    with open(os.path.join(tmp, "meta_beauty.json")) as f:
        meta = json.load(f)
    corpus = [
        " ".join(str(v) for v in (m.values() if isinstance(m, dict) else m))
        for m in meta.values()
    ]
    tok = UniMPTokenizer.from_corpus(corpus)
    extend_vocabulary(tok, subset="beauty", use_semantic=False, task="rec",
                      n_items=n_items)

    def mk(split, shuffle, task="rec"):
        ds = TaskDataset(tmp, "beauty", task, split, tok,
                         history_len=5, n_items=n_items, load_images=False)
        return DataLoader(ds, batch_size, tok.pad_token_id, shuffle=shuffle,
                          seed=seed, drop_last=shuffle, num_workers=0)

    tasks = list(tasks)
    train_loader = mk("train", True,
                      task=tasks if len(tasks) > 1 else tasks[0])
    train_batches = []
    epoch = 0
    while len(train_batches) < steps:
        train_loader.set_epoch(epoch)
        for b in train_loader:
            b.pop("image_ids", None)  # text-only protocol
            b.pop("media_count", None)
            train_batches.append(b)
            if len(train_batches) >= steps:
                break
        epoch += 1

    eval_batches = []
    for b in mk("test", False):
        b.pop("image_ids", None)
        b.pop("media_count", None)
        eval_batches.append(b)
    return tok, train_batches, eval_batches


def build_models(tok, *, hidden=64, layers=2, heads=2, mlp=96, seed=7):
    """Vendored reference LlamaForCausalLM + our UniMPModel sharing its
    exact initial weights via the production converter."""
    import jax
    import jax.numpy as jnp
    import torch
    from test_convert import _reference_classes
    from transformers import GenerationMixin, LlamaConfig

    from unimp_tpu.models import UniMPModel
    from unimp_tpu.models.config import (
        LMConfig, ResamplerConfig, UniMPConfig, VisionConfig,
    )
    from unimp_tpu.tools.convert_torch import convert_state_dict

    vocab = ((len(tok) + 127) // 128) * 128  # cli/common.py:68 padding
    LlamaForCausalLM, _ = _reference_classes()

    class _GenLlama(LlamaForCausalLM, GenerationMixin):
        # keep the vendored legacy tuple KV cache + its own
        # _reorder_cache (llama.py:871) inside the real generate loop
        @classmethod
        def _supports_default_dynamic_cache(cls):
            return False

    torch.manual_seed(seed)
    tl = _GenLlama(LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=mlp,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=512, rms_norm_eps=1e-5,
    )).eval()

    cfg = UniMPConfig(
        VisionConfig(image_size=28, patch_size=14, hidden_size=32,
                     num_layers=1, num_heads=2),
        ResamplerConfig(num_latents=4, depth=1, num_heads=2, head_dim=16),
        LMConfig(vocab_size=vocab, hidden_size=hidden, num_layers=layers,
                 num_heads=heads, mlp_hidden=mlp, norm="rmsnorm",
                 positions="rope", act="silu", parallel_block=False,
                 use_bias=False, tie_embeddings=False, layernorm_eps=1e-5),
        cross_attn_every_n=2, dtype="float32",
    )
    model = UniMPModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 8), jnp.int32))["params"]
    sd = {f"lang_encoder.{k}": v.numpy() for k, v in tl.state_dict().items()}
    params, report = convert_state_dict(sd, params)
    assert report["missed"] == [], report["missed"]
    return tl, model, params


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def train_torch(tl, batches, tok, *, lr):
    """The reference training semantics on the vendored reference model."""
    import torch
    import torch.nn.functional as F
    from transformers import get_constant_schedule_with_warmup

    from unimp_tpu.data.masking import answer_span_labels_reference

    # recommender.py:521-543 — decay only on gated-xattn params (none in
    # the bare LM), so every group runs weight_decay=0
    opt = torch.optim.AdamW(
        [{"params": list(tl.parameters()), "weight_decay": 0.0}], lr=lr)
    sched = get_constant_schedule_with_warmup(opt, num_warmup_steps=0)
    tl.train()
    losses = []
    for b in batches:
        ids_np = b["input_ids"]
        labels_np = answer_span_labels_reference(
            ids_np, tok.answer_token_id, tok.endofchunk_token_id,
            tok.media_token_id, tok.pad_token_id)
        ids = torch.tensor(ids_np, dtype=torch.long)
        labels = torch.tensor(labels_np, dtype=torch.long)
        w = torch.tensor(b["weights"], dtype=torch.float32)
        logits = tl(input_ids=ids).logits
        # mmrec.py:177-213: shifted per-token CE (ignore -100), times the
        # per-sample task weight, normalized by the unmasked count
        sl = logits[:, :-1].float()
        lab = labels[:, 1:]
        ce = F.cross_entropy(
            sl.reshape(-1, sl.shape[-1]), lab.reshape(-1),
            ignore_index=-100, reduction="none",
        ).reshape(lab.shape)
        valid = (lab != -100).float()
        loss = (w[:, None] * ce * valid).sum() / valid.sum().clamp(min=1)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tl.parameters(), 1.0)
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    tl.eval()
    return losses


def train_jax(model, params, batches, tok, *, lr, steps):
    """The production JAX pieces: masking -> loss.py -> optimizer.py."""
    import jax
    import jax.numpy as jnp
    import optax

    from unimp_tpu.data.masking import answer_span_labels
    from unimp_tpu.train.loss import masked_focal_loss
    from unimp_tpu.train.optimizer import make_optimizer

    opt = make_optimizer(params, learning_rate=lr, lr_scheduler="constant",
                         total_steps=steps, warmup_steps=0,
                         weight_decay=0.1, max_grad_norm=1.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, ids, seq_len, weights):
        def loss_fn(pp):
            labels = answer_span_labels(
                ids, tok.answer_token_id, tok.endofchunk_token_id,
                tok.media_token_id, tok.pad_token_id)
            logits, _ = model.apply({"params": pp}, ids, kv_len=seq_len)
            return masked_focal_loss(logits, labels, weights)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for b in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(b["input_ids"]),
            jnp.asarray(b["seq_len"]), jnp.asarray(b["weights"]))
        losses.append(float(loss))
    return params, losses


# --------------------------------------------------------------------------
# eval
# --------------------------------------------------------------------------

def eval_torch(tl, batches, tok, *, num_beams=10):
    """The reference eval protocol: one generate() per user
    (eval_rec.py:100-110), exact-match against the target item token,
    rank metrics via the golden-tested metric functions."""
    import torch

    from unimp_tpu.evals.metrics import rank_metrics_for_hits

    def norm(s):
        return "".join(s.split())

    per_user = []
    for b in batches:
        for i in range(len(b["input_ids"])):
            n = int(b["seq_len"][i])
            ids = torch.tensor(b["input_ids"][i, :n][None, :],
                               dtype=torch.long)
            with torch.no_grad():
                out = tl.generate(
                    input_ids=ids, attention_mask=torch.ones_like(ids),
                    num_beams=num_beams, num_return_sequences=num_beams,
                    max_new_tokens=EVAL_MAX_NEW, early_stopping=True,
                    do_sample=False, eos_token_id=tok.eos_token_id,
                    pad_token_id=tok.eos_token_id,
                )
            gen = out.numpy()[:, n:]
            answers = [t.split("?")[-1].strip()
                       for t in tok.batch_decode(gen)]
            target = b["targets"][i]
            hits = np.array([norm(a) == norm(target) for a in answers], int)
            per_user.append(rank_metrics_for_hits(hits))
    keys = per_user[0].keys()
    return {k: float(np.mean([u[k] for u in per_user])) for k in keys}, per_user


def eval_jax(model, params, batches, tok, *, num_beams=10):
    from unimp_tpu.evals.evaluators import evaluate_rec

    m = evaluate_rec(model, params, batches, tok, num_beams=num_beams,
                     max_new_tokens=EVAL_MAX_NEW,
                     length_norm="generated")
    m.pop("items_per_sec", None)
    return m


# --------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--n-items", type=int, default=32)
    # test split gets n_users // 6 users (tools/synth_data.py:85) — 600
    # training users -> 100 eval users, so one beam flip moves HR by 1%
    ap.add_argument("--n-users", type=int, default=600)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--tasks", default="rec",
                    help="comma list, final task last — multi-task "
                         "mixing with 25%% non-final subsampling "
                         "(rec_dataset.py:180-206), e.g. "
                         "search,exp,img_sel,rec")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        tok, train_batches, eval_batches = build_data(
            tmp, n_items=args.n_items, n_users=args.n_users,
            steps=args.steps, batch_size=args.batch_size,
            tasks=tuple(args.tasks.split(",")))
        tl, model, params = build_models(tok)

        print(f"[parity] vocab={len(tok)} train_steps={len(train_batches)} "
              f"eval_batches={len(eval_batches)}", file=sys.stderr)

        t_losses = train_torch(tl, train_batches, tok, lr=args.lr)
        params, j_losses = train_jax(model, params, train_batches, tok,
                                     lr=args.lr, steps=args.steps)
        loss_gap = float(np.max(np.abs(np.array(t_losses)
                                       - np.array(j_losses))))
        print(f"[parity] loss[0] torch={t_losses[0]:.5f} "
              f"jax={j_losses[0]:.5f}  loss[-1] torch={t_losses[-1]:.5f} "
              f"jax={j_losses[-1]:.5f}  max|gap|={loss_gap:.2e}",
              file=sys.stderr)

        t_metrics, _ = eval_torch(tl, eval_batches, tok)
        j_metrics = eval_jax(model, params, eval_batches, tok)

        deltas = {k: abs(t_metrics[k] - j_metrics[k])
                  for k in ("hr@10", "ndcg@10", "hr@5", "mrr@10")}
        record = {
            "config": {"steps": args.steps, "n_items": args.n_items,
                       "n_users": args.n_users, "lr": args.lr,
                       "batch_size": args.batch_size,
                       "tasks": args.tasks},
            "torch": t_metrics, "jax": j_metrics, "delta": deltas,
            "train_loss_max_gap": loss_gap,
            "torch_final_loss": t_losses[-1], "jax_final_loss": j_losses[-1],
        }
        print(json.dumps(record))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)
        return record


if __name__ == "__main__":
    main()
