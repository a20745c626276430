"""New-domain transfer entry point — parity with mmrec_prefix.py.

Mirrors /root/reference/UniMP/mmrec_prefix.py: load a multi-task
checkpoint, extend the vocabulary with ``item_domain_{i}`` tokens
(office=1574, tool=6885), FREEZE the perceiver resampler, the gated
cross-attention blocks and the token embeddings, and fine-tune the rest
on the new domain. Freezing is a trainable-subtree partition (see
train/partition.py) instead of requires_grad_(False) — frozen params get
no gradients, no Adam moments, and no weight decay; ``--only_test``
short-circuits to evaluation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from unimp_tpu.cli import common
from unimp_tpu.cli.arguments import build_parser
from unimp_tpu.cli.mmrec import run_evals, train_one_epoch
from unimp_tpu.train import checkpoint as ckpt
from unimp_tpu.train.optimizer import make_optimizer
from unimp_tpu.train.trainer import Trainer
from unimp_tpu.utils import MetricLogger, StepTimer


def frozen_mask(params):
    """True = trainable. Freezes the perceiver resampler and the gated
    cross-attention blocks (mmrec_prefix.py:631-632).

    The reference also calls ``requires_grad_(False)`` on the input
    embeddings (mmrec_prefix.py:633) but then immediately
    ``resize_token_embeddings(len(tokenizer))`` (mmrec_prefix.py:647-654),
    which replaces the embedding module with a fresh — trainable — one.
    The *effective* reference behavior is therefore a trainable (resized)
    embedding table; freezing it here would leave the new
    ``item_domain_{i}`` rows at random init forever (and, for
    tied-embedding variants, freeze the LM head too)."""
    from unimp_tpu.train.partition import path_mask

    return path_mask(
        params,
        lambda path, _: not (path.startswith("resampler") or "xattn_" in path),
    )


def main(argv=None):
    parser = build_parser(eval_only=True)
    args = parser.parse_args(argv)
    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.transfer_domain is None:
        args.transfer_domain = "office"
    rank = jax.process_index()

    tokenizer = common.build_tokenizer(args)  # adds item_domain_{i}
    model = common.build_model(args, tokenizer)
    mesh = common.build_mesh(args)

    train_ds = common.make_dataset(args, tokenizer, "train", task=args.task)
    train_loader = common.make_loader(args, train_ds, tokenizer, train=True)
    sample_batch = next(iter(train_loader))

    load_dir = args.load_dir or os.path.join(
        args.external_save_dir or ".", args.load_run_name or args.run_name
    )
    save_dir = os.path.join(args.external_save_dir or ".",
                            f"{args.run_name}_{args.transfer_domain}")
    logger = MetricLogger(save_dir, args.run_name, rank=rank,
                          use_wandb=args.report_to_wandb,
                          wandb_project=args.wandb_project,
                          wandb_entity=args.wandb_entity, config=vars(args))

    if args.only_test:
        from unimp_tpu.cli.mmrec_eval import init_params

        params = init_params(args, model, tokenizer, sample_batch)
        if args.load_weights_name:
            restored = ckpt.restore_params(load_dir, args.load_weights_name)
            params = ckpt.merge_with_growth(restored, params)
        return run_evals(args, model, params, tokenizer, logger, epoch=0,
                         tasks=[args.task], mesh=mesh)

    total_steps = len(train_loader) * args.num_epochs
    if args.gradient_accumulation_steps > 1 and not args.fused_accumulation:
        # schedule horizon in optimizer updates (see cli/mmrec.py)
        total_steps = max(1, total_steps // args.gradient_accumulation_steps)
    warmup = (
        int(total_steps * args.warmup_steps_ratio)
        if args.warmup_steps_ratio is not None
        else args.warmup_steps
    )
    trainer = Trainer(
        model,
        optimizer=None,
        media_id=tokenizer.media_token_id,
        answer_id=tokenizer.answer_token_id,
        endofchunk_id=tokenizer.endofchunk_token_id,
        pad_id=tokenizer.pad_token_id,
        gamma=args.gamma,
        use_reweight=args.use_reweight,
        mesh=mesh,
        trainable_mask=frozen_mask,
        accum_steps=(args.gradient_accumulation_steps
                     if args.fused_accumulation else 1),
    )
    # Freeze/decay masks need only the tree structure — derive abstractly
    # so params are born sharded in init_state (no unsharded full tree);
    # the optimizer is built over the trainable subtree only.
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(sample_batch),
        learning_rate=args.learning_rate,
        lr_scheduler=args.lr_scheduler,
        total_steps=total_steps,
        warmup_steps=warmup,
        weight_decay=args.weight_decay,
    )
    if args.gradient_accumulation_steps > 1 and not args.fused_accumulation:
        import optax

        trainer.optimizer = optax.MultiSteps(
            trainer.optimizer, args.gradient_accumulation_steps
        )
    state = trainer.init_state(jax.random.PRNGKey(args.seed), sample_batch)
    if args.load_weights_name:
        # vocabulary grew (item_domain_{i} tokens) — restore raw, graft the
        # overlap onto the fresh sharded init, re-place with the same
        # shardings (host-side merge; device copies stay sharded).
        restored = ckpt.restore_params(load_dir, args.load_weights_name)
        merged = ckpt.merge_with_growth(restored, state.params)
        state = state.replace(params=jax.device_put(
            merged, jax.tree.map(lambda x: x.sharding, state.params)))

    if args.cache_vision_latents:
        # transfer freezes the tower too (mmrec_prefix.py:631 semantics);
        # build the per-item feature cache from the LIVE (restored) params
        from unimp_tpu.train.vision_cache import build_tower_cache

        cache = build_tower_cache(
            model, state.params, train_ds.item_image, train_ds.n_items)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            cache = jax.device_put(
                cache, NamedSharding(mesh, PartitionSpec()))
        trainer.vision_cache = cache
        logger.print(f"vision tower cache: {train_ds.n_items} items, "
                     f"{cache.nbytes / 2**20:.0f} MiB on device")

    timer = StepTimer()
    for epoch in range(args.num_epochs):
        state = train_one_epoch(
            args, trainer, state, train_loader, epoch, logger, timer
        )
        epoch_cache = {}
        if args.do_eval:
            run_evals(args, model, state.params, tokenizer, logger, epoch,
                      tasks=[args.task], split="eval", mesh=mesh,
                      cache_holder=epoch_cache)
        if args.do_test:
            run_evals(args, model, state.params, tokenizer, logger, epoch,
                      tasks=[args.task], split="test", mesh=mesh,
                      cache_holder=epoch_cache)
        if rank == 0:
            ckpt.save_epoch(save_dir, state.params, epoch)
    if rank == 0:
        ckpt.save_params(save_dir, state.params, "final_weights")
    return state


if __name__ == "__main__":
    main()
