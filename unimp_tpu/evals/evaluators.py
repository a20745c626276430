"""Per-task evaluators: batched beam generation -> task metrics.

Protocol parity with /root/reference/UniMP/pipeline/eval/:
  rec      eval_rec.py:100-157   — 10 beams, 10 returns, max 50 new,
           exact-match of "text after the question mark" vs the target
           item token; HR/NDCG/MRR @ {3,5,10}
  search   eval_search.py:98-155 — same, max 20 new
  exp      eval_exp.py:103-171   — 5 beams / 1 return, max 256; rating
           parsed from the leading "rate_k" (fallback 3.0); MAE/RMSE +
           BLEU/ROUGE/METEOR (+BERTScore when a scorer is injected)
  img_sel  eval_img_sel.py:94-136 — 2 beams / 1 return, max 40; the
           generated s_i token set vs ground truth; recall/precision/F1
  img_gen  eval_img_gen.py:102-144 — greedy, max 600; dumps generated
           VQGAN token strings for offline decoding

TPU-native difference: generation is BATCHED (the reference is locked to
batch_size=1, its main throughput bottleneck) — prompts are left-aligned
into one window and decoded together. Exact-match comparison is done on
whitespace-normalized strings so atomic ("item_7") and semantic
("item_3item_17") answers compare identically under any tokenizer's
detokenization spacing.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from unimp_tpu.data.transforms import normalize_on_device
from unimp_tpu.decode import GenerationConfig, Generator
from unimp_tpu.evals import text_metrics
from unimp_tpu.evals.metrics import f1_score, rank_metrics_for_hits


def _norm(s: str) -> str:
    return "".join(s.split())


def _answers(tokenizer, tokens: np.ndarray):
    """[B, R, L] generated tokens -> list (per row) of R answer strings."""
    out = []
    for row in tokens:
        texts = tokenizer.batch_decode(row, skip_special_tokens=True)
        out.append([t.split("?")[-1].strip() for t in texts])
    return out


def _generate_batches(model, params, loader, tokenizer, gen_cfg, mesh=None,
                      cache_holder=None):
    """Yield (answers, batch, items_per_sec) over the eval loader.

    One generation is kept in flight: batch i+1's host prep (image
    decode, tokenize, collate — the loader's worker threads) and device
    dispatch overlap with batch i's device decode, then tokens are
    materialized. The reference can't overlap at all (synchronous
    batch-1 generate per user).

    Batches that carry ``image_ids`` instead of pixels (the dataset's
    load_images=False eval mode) are served from an ItemLatentCache:
    each unique item image is encoded exactly once for the whole eval
    and per-batch host->device traffic drops to a [B, M] int32 array.

    With a mesh, inputs are placed sharded over the (dp, fsdp) axes so
    the whole beam decode runs SPMD across local chips (rows are padded
    by repeating the last user up to the shard multiple; the padded
    rows' answers are dropped before metrics).
    """
    gen = Generator(model, gen_cfg, media_id=tokenizer.media_token_id,
                    mesh=mesh)
    import jax

    rows_mult = 1
    bshard = None
    if mesh is not None:
        from unimp_tpu.parallel.sharding import batch_sharding

        bshard = batch_sharding(mesh)
        rows_mult = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)

    def place(arr):
        arr = np.asarray(arr)
        pad = (-len(arr)) % rows_mult
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
        if bshard is not None:
            return jax.device_put(arr, bshard)
        return jnp.asarray(arr)

    @jax.jit
    def encode(p, v):
        # params as an argument, NOT a closure: closed-over arrays are
        # baked into the HLO as constants, which breaks large models.
        return model.apply(
            {"params": p}, normalize_on_device(v),
            method=type(model).encode_vision,
        )

    # cache_holder: dict shared across evaluator calls within one
    # run_evals pass (same params) so the catalog is encoded ONCE per
    # epoch, not once per task x split
    holder = cache_holder if cache_holder is not None else {}

    def batch_latents(batch):
        if "image_ids" in batch:
            cache = holder.get("latent_cache")
            if cache is None:
                from unimp_tpu.evals.latent_cache import ItemLatentCache

                ds = loader.dataset
                cache = ItemLatentCache(
                    model, params, ds.item_image, ds.n_items
                )
                holder["latent_cache"] = cache
            # host ids drive miss detection; the placed copy keeps the
            # gather on the mesh (no device->host readback per batch)
            return cache.gather(batch["image_ids"],
                                place(batch["image_ids"]))
        if "images" in batch:
            return encode(params, place(batch["images"]))
        # text-only batch (no media columns): the model's vision path is
        # skipped entirely (models/flamingo.py:236)
        return None

    pending = None  # (tokens_device, n_rows, batch, t_start)
    t0 = time.perf_counter()
    for batch in loader:
        latents = batch_latents(batch)
        tokens, _ = gen.generate(
            params,
            place(batch["input_ids"]),
            place(batch["seq_len"]),
            latents,
        )
        if pending is not None:
            p_tokens, p_n, p_batch, p_t0 = pending
            p_np = np.asarray(p_tokens)[:p_n]  # blocks until batch i done
            dt = time.perf_counter() - p_t0
            yield _answers(tokenizer, p_np), p_batch, len(p_np) / dt
        pending = (tokens, len(batch["input_ids"]), batch, t0)
        t0 = time.perf_counter()
    if pending is not None:
        p_tokens, p_n, p_batch, p_t0 = pending
        p_np = np.asarray(p_tokens)[:p_n]
        dt = time.perf_counter() - p_t0
        yield _answers(tokenizer, p_np), p_batch, len(p_np) / dt


def _rank_eval(model, params, loader, tokenizer, *, max_new_tokens, ks=(3, 5, 10),
               num_beams=10, dump_path: Optional[str] = None, mesh=None,
               kv_int8=False, cache_holder=None, length_norm="full"):
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens, eos_id=tokenizer.eos_token_id,
        pad_id=tokenizer.eos_token_id, num_beams=num_beams,
        num_return_sequences=num_beams, kv_int8=kv_int8,
        length_norm=length_norm,
    )
    per_user = []
    throughput = []
    for answers, batch, ips in _generate_batches(
        model, params, loader, tokenizer, gen_cfg, mesh=mesh,
        cache_holder=cache_holder,
    ):
        throughput.append(ips)
        for row, target in zip(answers, batch["targets"]):
            hits = np.array(
                [_norm(a) == _norm(target) for a in row], dtype=int
            )
            per_user.append(rank_metrics_for_hits(hits, ks=ks, len_gt=1))
    # cross-host aggregation (reference: accelerator.gather,
    # eval_search.py:150-155)
    from unimp_tpu.evals.dist import gather_metric_lists

    keys = per_user[0].keys() if per_user else []
    metrics = {
        k: float(np.mean(gather_metric_lists([u[k] for u in per_user])))
        for k in keys
    }
    metrics["items_per_sec"] = float(np.mean(throughput)) if throughput else 0.0
    metrics["n_users"] = int(
        gather_metric_lists([float(len(per_user))]).sum()
    )
    if dump_path:
        os.makedirs(os.path.dirname(dump_path) or ".", exist_ok=True)
        with open(dump_path, "w") as f:
            json.dump(per_user, f)
    return metrics


def evaluate_rec(model, params, loader, tokenizer, **kw):
    kw.setdefault("max_new_tokens", 50)
    return _rank_eval(model, params, loader, tokenizer, **kw)


def evaluate_search(model, params, loader, tokenizer, **kw):
    kw.setdefault("max_new_tokens", 20)
    return _rank_eval(model, params, loader, tokenizer, **kw)


def evaluate_exp(
    model, params, loader, tokenizer, *,
    max_new_tokens=256, num_beams=5,
    bertscore_fn: Optional[Callable] = None,
    dump_dir: Optional[str] = None, rank: int = 0, mesh=None,
    kv_int8=False, cache_holder=None,
):
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens, eos_id=tokenizer.eos_token_id,
        pad_id=tokenizer.eos_token_id, num_beams=num_beams,
        num_return_sequences=1, kv_int8=kv_int8,
    )
    abs_err, sq_err = [], []
    gen_exps, real_exps = [], []
    throughput = []
    for answers, batch, ips in _generate_batches(
        model, params, loader, tokenizer, gen_cfg, mesh=mesh,
        cache_holder=cache_holder,
    ):
        throughput.append(ips)
        for row, target in zip(answers, batch["targets"]):
            words = row[0].split()
            try:
                rate = float(words[0].split("_")[-1])
            except (IndexError, ValueError):
                rate = 3.0  # reference fallback (eval_exp.py:122-124)
            exp = " ".join(words[1:]) or "Empty"
            abs_err.append(abs(rate - target["rating"]))
            sq_err.append((rate - target["rating"]) ** 2)
            gen_exps.append(exp)
            real_exps.append(target["explanation"])
    metrics = {
        "mae": float(np.mean(abs_err)),
        "rmse": float(np.sqrt(np.mean(sq_err))),
        "bleu": text_metrics.bleu(gen_exps, real_exps)["precision1"],
        "rouge1": text_metrics.rouge_n(gen_exps, real_exps, 1),
        "rouge2": text_metrics.rouge_n(gen_exps, real_exps, 2),
        "rougeL": text_metrics.rouge_l(gen_exps, real_exps),
        "meteor": text_metrics.meteor(gen_exps, real_exps),
        "items_per_sec": float(np.mean(throughput)) if throughput else 0.0,
        "n_users": len(gen_exps),
    }
    if bertscore_fn is not None:
        metrics["bertscore"] = float(np.mean(bertscore_fn(gen_exps, real_exps)))
    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)
        with open(os.path.join(dump_dir, f"gen_exps_{rank}.json"), "w") as f:
            json.dump(gen_exps, f)
        with open(os.path.join(dump_dir, f"real_exps_{rank}.json"), "w") as f:
            json.dump(real_exps, f)
    return metrics


def evaluate_img_sel(model, params, loader, tokenizer, *,
                     max_new_tokens=40, num_beams=2, mesh=None,
                     kv_int8=False, cache_holder=None):
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens, eos_id=tokenizer.eos_token_id,
        pad_id=tokenizer.eos_token_id, num_beams=num_beams,
        num_return_sequences=1, kv_int8=kv_int8,
    )
    recalls, precisions, f1s = [], [], []
    throughput = []
    for answers, batch, ips in _generate_batches(
        model, params, loader, tokenizer, gen_cfg, mesh=mesh,
        cache_holder=cache_holder,
    ):
        throughput.append(ips)
        for row, target in zip(answers, batch["targets"]):
            gen_ids = set(row[0].split())
            gts = [f"s_{i}" for i in target]
            r = sum(1 for g in gen_ids if g in gts)
            recall = r / len(gts)
            precision = r / len(gen_ids) if gen_ids else 0.0
            recalls.append(recall)
            precisions.append(precision)
            f1s.append(f1_score(precision, recall))
    return {
        "recall": float(np.mean(recalls)),
        "precision": float(np.mean(precisions)),
        "f1": float(np.mean(f1s)),
        "items_per_sec": float(np.mean(throughput)) if throughput else 0.0,
        "n_users": len(recalls),
    }


def evaluate_img_gen(model, params, loader, tokenizer, *,
                     max_new_tokens=600, dump_path: Optional[str] = None,
                     rank: int = 0, epoch: int = 0, run_name: str = "run",
                     mesh=None, kv_int8=False, cache_holder=None):
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens, eos_id=tokenizer.eos_token_id,
        pad_id=tokenizer.eos_token_id, num_beams=1, num_return_sequences=1,
        kv_int8=kv_int8,
    )
    generations = []
    throughput = []
    for answers, batch, ips in _generate_batches(
        model, params, loader, tokenizer, gen_cfg, mesh=mesh,
        cache_holder=cache_holder,
    ):
        throughput.append(ips)
        for row, target, extra in zip(
            answers, batch["targets"], batch.get("extras", [None] * len(answers))
        ):
            generations.append(
                {"generated": row[0], "target": target,
                 "item": None if extra is None else extra.get("item")}
            )
    if dump_path is None:
        dump_path = f"save_img_gen/img_gen_{rank}_epoch_{epoch}_name_{run_name}.json"
    os.makedirs(os.path.dirname(dump_path) or ".", exist_ok=True)
    with open(dump_path, "w") as f:
        json.dump(generations, f)
    return {
        "n_generated": len(generations),
        "dump_path": dump_path,
        "items_per_sec": float(np.mean(throughput)) if throughput else 0.0,
    }


EVALUATORS = {
    "rec": evaluate_rec,
    "search": evaluate_search,
    "exp": evaluate_exp,
    "img_sel": evaluate_img_sel,
    "img_gen": evaluate_img_gen,
}
