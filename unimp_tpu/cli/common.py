"""Shared CLI setup: tokenizer, vocab, model, loaders, mesh.

Mirrors the setup sections of the reference entry points
(/root/reference/UniMP/mmrec.py:475-608: model build per variant, vocab
extension + embedding resize, loader construction)."""

from __future__ import annotations

import dataclasses
import os

import jax

from unimp_tpu.cli.arguments import variant_name
from unimp_tpu.data.dataset import TaskDataset
from unimp_tpu.data.loader import DataLoader
from unimp_tpu.data.tokenizer import UniMPTokenizer
from unimp_tpu.data.vocab import extend_vocabulary
from unimp_tpu.models import UniMPModel, get_config
from unimp_tpu.parallel import make_mesh


def build_tokenizer(args) -> UniMPTokenizer:
    if args.tokenizer_path:
        tok = UniMPTokenizer.load(args.tokenizer_path)
    else:
        corpus_path = os.path.join(args.mmrec_path, "corpus.txt")
        if os.path.exists(corpus_path):
            with open(corpus_path) as f:
                corpus = f.read().splitlines()
        else:
            # fall back to item metadata as the corpus
            import json

            with open(os.path.join(args.mmrec_path, f"meta_{args.subset}.json")) as f:
                meta = json.load(f)
            corpus = [
                " ".join(str(v) for v in (m.values() if isinstance(m, dict) else m))
                for m in meta.values()
            ]
        tok = UniMPTokenizer.from_corpus(corpus)
    extend_vocabulary(
        tok, subset=args.subset, use_semantic=args.use_semantic,
        task=args.task, n_items=args.n_items,
        transfer_domain=getattr(args, "transfer_domain", None),
    )
    return tok


def build_model(args, tokenizer) -> UniMPModel:
    if getattr(args, "config_json", None):
        # Otter-HF path: build from a Flamingo/Otter config.json
        # (recommender.py:421-422)
        from unimp_tpu.models.config import config_from_json

        cfg = config_from_json(args.config_json)
    else:
        cfg = get_config(variant_name(args))
    overrides = {}
    if args.cross_attn_every_n_layers:
        overrides["cross_attn_every_n"] = args.cross_attn_every_n_layers
    if args.precision in ("fp32", "amp"):
        overrides["dtype"] = "float32"
    if getattr(args, "remat", False):
        overrides["remat"] = True
    if getattr(args, "remat_policy", "none") != "none":
        overrides["remat_policy"] = args.remat_policy
    if overrides:
        cfg = cfg.replace(**overrides)
    # embedding resize equivalent (mmrec.py:595): size the vocab to the
    # extended tokenizer, padded up for MXU-friendly lm-head tiling.
    vocab = ((len(tokenizer) + 127) // 128) * 128
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=vocab))
    return UniMPModel(cfg)


def build_mesh(args):
    mesh = make_mesh(dp=None, fsdp=args.mesh_fsdp, tp=args.mesh_tp)
    if getattr(args, "seq_shard", False):
        # route causal self-attention through ring attention, sequence
        # sharded over the fsdp axis (read at trace time)
        from unimp_tpu.parallel import set_sequence_sharding

        set_sequence_sharding(mesh, seq_axis="fsdp", batch_axis="dp")
    return mesh


def make_dataset(args, tokenizer, split: str, task=None) -> TaskDataset:
    task = task if task is not None else args.task
    # --img_gen_mode pretrain selects the single-item catalog variant
    # (rec_dataset.py:536-611; the reference toggles it by editing code)
    if task == "img_gen" and getattr(args, "img_gen_mode", "retrieve") == "pretrain":
        task = "img_gen_pretrain"
    # eval batches carry item ids; images are encoded once into a
    # device-side latent cache (evals/latent_cache.py). Train batches
    # do the same under --cache_vision_latents (frozen-tower feature
    # cache, train/vision_cache.py).
    if split == "train":
        load_images = not getattr(args, "cache_vision_latents", False)
    else:
        load_images = getattr(args, "no_eval_latent_cache", False)
    return TaskDataset(
        args.mmrec_path,
        args.subset,
        task,
        split,
        tokenizer,
        use_semantic=args.use_semantic,
        image_size=args.patch_image_size,
        seed=args.pretrain_seed,
        history_len=args.history_len,
        n_items=args.n_items,
        load_images=load_images,
        max_records=args.max_records,
    )


def make_loader(args, ds, tokenizer, *, train: bool) -> DataLoader:
    # fused accumulation: the loader yields accum microbatches at once
    # and the trainer scans them inside one step (Trainer.accum_steps)
    accum = (getattr(args, "gradient_accumulation_steps", 1)
             if train and getattr(args, "fused_accumulation", False) else 1)
    return DataLoader(
        ds,
        batch_size=(args.batch_size * accum if train
                    else args.eval_batch_size),
        pad_id=tokenizer.pad_token_id,
        shuffle=train,
        seed=args.seed,
        drop_last=train,
        num_workers=args.workers,
        pad_to_multiple=128,
        max_text_len=args.max_src_length,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )


def multi_task_list(args):
    """Reference multi-task order (rec_dataset.py:180-206 consumes the
    list; unimp_all_tasks.sh passes img_sel,search,rec,exp)."""
    if args.single_task:
        return args.task
    return ["img_sel", "search", "rec", "exp"]


def curriculum_tasks(epoch: int, num_epochs: int):
    """--train_method continue schedule (mmrec.py:743-755)."""
    if epoch <= num_epochs // 4:
        return ["rec"]
    if epoch <= num_epochs // 2:
        return ["rec", "search"]
    if epoch <= num_epochs // 4 * 3:
        return ["rec", "search", "img_sel"]
    return ["rec", "search", "img_sel", "exp"]
