"""Training entry point — CLI parity with the reference's mmrec.py.

Flow mirrors /root/reference/UniMP/mmrec.py:306-894: build model +
extended vocabulary, loaders, AdamW with gated-xattn-only weight decay
and warmup scheduler, then per epoch: train (focal/task-weighted masked
CE) and per-task eval on the test split, checkpointing each epoch.
Distribution is a jax mesh (DP x FSDP x TP) instead of
accelerate/DeepSpeed; launch is plain `python -m unimp_tpu.cli.mmrec`
(one process per host — no per-device process needed on TPU).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from unimp_tpu.cli import common
from unimp_tpu.cli.arguments import build_parser
from unimp_tpu.evals import EVALUATORS
from unimp_tpu.train import checkpoint as ckpt
from unimp_tpu.train.optimizer import make_optimizer
from unimp_tpu.train.trainer import Trainer
from unimp_tpu.utils import MetricLogger, StepTimer, maybe_trace


def train_one_epoch(args, trainer, state, loader, epoch, logger, timer):
    loader.set_epoch(epoch)
    num_batches = len(loader)
    # No explicit device-side double buffering: jax's async dispatch
    # already overlaps batch N+1's host->device copy with step N's
    # compute (the loop enqueues ahead), and the host input pipeline is
    # not the bound — measured at the reference training shape with real
    # JPEG decode: data_time 9.3 ms of a 396.5 ms step (2.4%); explicit
    # prefetch_to_device measured SLOWER both inline (423 ms) and
    # threaded (443 ms) from tunnel/thread contention
    # (benchmarks/records/train_3b-mpt_refshape_datatime_v5e.json).
    # UNIMP_DEVICE_PREFETCH=1 opts in (data/loader.py prefetch_to_device)
    # for hosts where the transfer is the bound.
    batches = iter(loader)
    if os.environ.get("UNIMP_DEVICE_PREFETCH", "") == "1":
        from unimp_tpu.data.loader import prefetch_to_device

        batches = prefetch_to_device(batches, trainer.device_batch)
    for step_idx, batch in enumerate(batches):
        timer.data_loaded()
        state, metrics = trainer.train_step(state, batch)
        timer.step_done()
        global_step = epoch * num_batches + step_idx
        if (step_idx + 1) % args.logging_steps == 0:
            loss = float(metrics["loss"])
            logger.log(
                {
                    "loss_multi_instruct": loss,
                    "ce": float(metrics["ce"]),
                    "accuracy": float(metrics["accuracy"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    **timer.throughput(args.batch_size, jax.process_count()),
                },
                step=global_step,
            )
            logger.print(
                f"Step {step_idx + 1}/{num_batches} of epoch "
                f"{epoch + 1}/{args.num_epochs}. Loss: {loss:.3f}"
            )
    return state


def run_evals(args, model, params, tokenizer, logger, epoch, tasks=None,
              split="test", mesh=None, cache_holder=None):
    """Evaluate `tasks` on `split` with per-rank dumps.

    Dump naming follows the reference: rec/search per-user metric JSONs
    (eval_rec.py:158), exp generations under save_gen/ plus an appended
    results_exp.txt (eval_exp.py:152-175), img_gen token dumps under
    save_img_gen/ (eval_img_gen.py:141-144) — all rooted in the run dir
    instead of the CWD.
    """
    tasks = tasks or ([args.task] if args.single_task else
                      ["rec", "exp", "img_sel", "search"])
    run_dir = os.path.join(args.external_save_dir or ".", args.run_name)
    rank = jax.process_index()
    if mesh is not None:
        # eval inputs are committed to the mesh (evaluators.place); params
        # must live on the same device set or jit refuses the mix. Trainer
        # states arrive already sharded (no-op); eval-only reloads
        # (mmrec_eval.init_params, restore_params) arrive single-device and
        # are placed with the train-time partition rules here.
        from unimp_tpu.parallel.sharding import param_sharding

        leaves = jax.tree_util.tree_leaves(params)
        want = set(mesh.devices.flat)
        if leaves and not (
            hasattr(leaves[0], "sharding")
            and leaves[0].sharding.device_set == want
        ):
            params = jax.device_put(params, param_sharding(params, mesh))
    if cache_holder is None:
        cache_holder = {}
    results = {}
    for task in tasks:
        try:
            ds = common.make_dataset(args, tokenizer, split, task=task)
        except FileNotFoundError as e:
            logger.print(f"[eval] skipping {task} ({split}): {e}")
            continue
        loader = common.make_loader(args, ds, tokenizer, train=False)
        loader.drop_last = False
        # with a mesh, eval batches are placed sharded over (dp, fsdp)
        # so the beam decode runs SPMD over local chips.
        # cache_holder shares one ItemLatentCache across every task in
        # this pass (same params) — the catalog is encoded once, not
        # once per task
        kwargs = {"mesh": mesh,
                  "kv_int8": getattr(args, "kv_int8", False),
                  "cache_holder": cache_holder}
        if task in ("rec", "search"):
            kwargs["num_beams"] = args.num_beams
            # per-rank metric dump, reference naming (eval_rec.py:158)
            kwargs["dump_path"] = os.path.join(
                run_dir, "results",
                f"{args.run_name}_{task}_{split}_epoch_{epoch}_rank_{rank}.json",
            )
        elif task == "exp":
            kwargs["dump_dir"] = os.path.join(run_dir, "save_gen")
            kwargs["rank"] = rank
            if getattr(args, "eval_embed", False):
                from unimp_tpu.evals.bertscore import make_model_bertscore

                kwargs["bertscore_fn"] = make_model_bertscore(
                    model, params, tokenizer
                )
        elif task == "img_gen":
            kwargs["dump_path"] = os.path.join(
                run_dir, "save_img_gen",
                f"img_gen_{rank}_epoch_{epoch}_name_{args.run_name}.json",
            )
        metrics = EVALUATORS[task](model, params, loader, tokenizer, **kwargs)
        results[task] = metrics
        if task == "exp" and rank == 0:
            # reference: append aggregate line to results_exp.txt
            # (eval_exp.py:168-175)
            line = " \n".join(
                f"{k}: {metrics[k]}"
                for k in ("rmse", "mae", "bleu", "rouge1", "rouge2",
                          "rougeL", "meteor", "bertscore") if k in metrics
            )
            with open(os.path.join(run_dir, "results_exp.txt"), "a+") as f:
                f.write(line + "\n\n")
        prefix = task if split == "test" else f"{task}/{split}"
        logger.log({f"{prefix}/{k}": v for k, v in metrics.items()
                    if isinstance(v, (int, float))}, step=epoch)
        logger.print(f"[epoch {epoch}] {task} ({split}): " + " ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()
            if isinstance(v, (int, float))))
    return results


def main(argv=None):
    args = build_parser().parse_args(argv)
    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rank = jax.process_index()

    tokenizer = common.build_tokenizer(args)
    model = common.build_model(args, tokenizer)
    mesh = common.build_mesh(args)

    task = args.task if args.single_task else common.multi_task_list(args)
    train_ds = common.make_dataset(args, tokenizer, "train", task=task)
    train_loader = common.make_loader(args, train_ds, tokenizer, train=True)

    total_steps = len(train_loader) * args.num_epochs
    if args.gradient_accumulation_steps > 1 and not args.fused_accumulation:
        # MultiSteps ticks the inner LR schedule once per ACCUMULATED
        # update, not per microbatch — size the horizon in optimizer
        # updates or warmup/decay run accum-times too slow (with
        # --fused_accumulation the loader already yields update-sized
        # batches, so len(train_loader) is the update count)
        total_steps = max(1, total_steps // args.gradient_accumulation_steps)
    warmup = (
        int(total_steps * args.warmup_steps_ratio)
        if args.warmup_steps_ratio is not None
        else args.warmup_steps
    )

    save_dir = os.path.join(args.external_save_dir or ".", args.run_name)
    logger = MetricLogger(
        save_dir, args.run_name, use_wandb=args.report_to_wandb,
        wandb_project=args.wandb_project, wandb_entity=args.wandb_entity,
        config=vars(args), rank=rank,
    )
    logger.print(f"Total training steps: {total_steps}")

    # Reference trainability (open_flamingo factory + resize at
    # mmrec.py:595): only perceiver + gated xattn + embeddings/lm head
    # train; the vision tower and LM backbone are frozen.
    from unimp_tpu.train.partition import backbone_trainable_mask

    trainer = Trainer(
        model,
        optimizer=None,
        media_id=tokenizer.media_token_id,
        answer_id=tokenizer.answer_token_id,
        endofchunk_id=tokenizer.endofchunk_token_id,
        pad_id=tokenizer.pad_token_id,
        gamma=args.gamma,
        use_reweight=args.use_reweight,
        mask_lm_head=args.mask_lm_head,
        mesh=mesh,
        trainable_mask=(None if args.unfreeze_backbone
                        else backbone_trainable_mask),
        frozen_dtype=("int8" if args.frozen_int8
                      else "bfloat16" if args.frozen_bf16 else None),
        grad_dtype=("bfloat16" if args.bf16_opt_state else None),
        accum_steps=(args.gradient_accumulation_steps
                     if args.fused_accumulation else 1),
    )

    rng = jax.random.PRNGKey(args.seed)
    sample_batch = next(iter(train_loader))
    # The optimizer's decay mask only needs the param tree *structure*
    # (paths + ndim) — derive it abstractly so no unsharded param tree is
    # ever materialized; init_state then creates params sharded-from-birth.
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(sample_batch),
        learning_rate=args.learning_rate,
        lr_scheduler=args.lr_scheduler,
        total_steps=total_steps,
        warmup_steps=warmup,
        weight_decay=args.weight_decay,
        mu_dtype="bfloat16" if args.bf16_opt_state else None,
        nu_dtype="bfloat16" if args.bf16_opt_state else None,
    )
    if args.gradient_accumulation_steps > 1 and not args.fused_accumulation:
        # MultiSteps keeps a second (accumulator) gradient tree; with
        # --fused_accumulation the trainer scans microbatches inside one
        # step instead (same math, one grad buffer — the only shape that
        # fits grad-accum at 3b on a single 16 GB chip)
        import optax

        trainer.optimizer = optax.MultiSteps(
            trainer.optimizer, args.gradient_accumulation_steps
        )
    state = trainer.init_state(rng, sample_batch)

    from unimp_tpu.utils.quant import abstract_dequantized, count_quantized

    def restore_storage(params):
        """Float tree (checkpoint/torch) -> live layout: re-apply int8
        frozen storage and the original shardings."""
        params = trainer.apply_frozen_storage(params)
        return jax.device_put(
            params, jax.tree.map(lambda x: x.sharding, state.params)
        )

    if args.load_from_original_checkpoint:
        from unimp_tpu.tools.convert_torch import load_torch_checkpoint

        like = state.params
        if count_quantized(like):
            # the converter fits torch tensors onto FLOAT targets (and
            # keeps the target value where a key is missing) — hand it
            # host-side dequantized floats, then restore int8 storage
            from unimp_tpu.utils.quant import dequantize_params_host

            like = dequantize_params_host(like)
        loaded = load_torch_checkpoint(
            args.load_from_original_checkpoint, like
        )
        state = state.replace(params=restore_storage(loaded))

    resume_epoch = 0
    if args.resume_from_checkpoint:
        latest = ckpt.latest_checkpoint(save_dir)
        if latest:
            logger.print(f"Resuming from {latest}")
            quantized = count_quantized(state.params) > 0
            like_params = (abstract_dequantized(state.params)
                           if quantized else state.params)
            payload = ckpt.restore_params(
                save_dir, latest,
                like={"params": like_params, "opt_state": state.opt_state,
                      "step": state.step, "epoch": 0},
            )
            params = payload["params"]
            if quantized:
                # checkpoints are float trees (save_params dequantizes);
                # re-apply the int8 frozen storage and shardings
                params = restore_storage(params)
            state = state.replace(
                params=params, opt_state=payload["opt_state"],
                step=payload["step"],
            )
            resume_epoch = int(payload["epoch"]) + 1

    if args.cache_vision_latents:
        # built AFTER any checkpoint/torch restore — the features are a
        # function of the live (frozen) tower params
        if args.unfreeze_backbone:
            raise SystemExit(
                "--cache_vision_latents requires the frozen tower "
                "(drop --unfreeze_backbone)")
        from unimp_tpu.train.vision_cache import build_tower_cache

        cache = build_tower_cache(
            model, state.params, train_ds.item_image, train_ds.n_items,
            progress=lambda s: None,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            cache = jax.device_put(
                cache, NamedSharding(mesh, PartitionSpec()))
        trainer.vision_cache = cache
        logger.print(
            f"vision tower cache: {train_ds.n_items} items, "
            f"{cache.nbytes / 2**20:.0f} MiB on device")

    timer = StepTimer()
    for epoch in range(resume_epoch, args.num_epochs):
        if args.train_method == "continue":
            tasks = common.curriculum_tasks(epoch, args.num_epochs)
            train_ds = common.make_dataset(args, tokenizer, "train", task=tasks)
            train_loader = common.make_loader(args, train_ds, tokenizer, train=True)
        with maybe_trace(args.trace_dir if epoch == resume_epoch else None):
            state = train_one_epoch(
                args, trainer, state, train_loader, epoch, logger, timer
            )
        # reference: separate eval-split and test-split passes per epoch
        # (mmrec.py:606-608, 775-871); one latent cache serves both
        # splits (same params, same catalog)
        epoch_cache = {}
        if args.do_eval:
            run_evals(args, model, state.params, tokenizer, logger, epoch,
                      split="eval", mesh=mesh, cache_holder=epoch_cache)
        if args.do_test:
            run_evals(args, model, state.params, tokenizer, logger, epoch,
                      split="test", mesh=mesh, cache_holder=epoch_cache)
        if rank == 0:
            ckpt.save_epoch(save_dir, state.params, epoch)
            ckpt.save_train_state(save_dir, state, epoch)
            if args.delete_previous_checkpoint and epoch > 0:
                import shutil

                prev = os.path.join(save_dir, f"checkpoint_{epoch - 1}")
                if os.path.isdir(prev):
                    shutil.rmtree(prev)
    if rank == 0:
        ckpt.save_params(save_dir, state.params, "final_weights")
        if getattr(args, "save_checkpoints_to_wandb", False):
            logger.log_artifact(
                os.path.join(save_dir, "final_weights"),
                name=f"{args.run_name}_final_weights",
            )
        if args.save_hf_model:
            from unimp_tpu.cli.arguments import variant_name
            from unimp_tpu.models import get_config
            from unimp_tpu.tools.export_torch import save_torch_checkpoint

            family = ("mpt" if get_config(variant_name(args)).lm.positions
                      == "alibi" else "neox")
            out = os.path.join(save_dir, "final_weights_torch.pt")
            export_params = state.params
            if count_quantized(export_params):
                from unimp_tpu.utils.quant import dequantize_params_host

                export_params = dequantize_params_host(export_params)
            save_torch_checkpoint(
                jax.device_get(export_params), out, lm_family=family
            )
            logger.print(f"Exported torch checkpoint: {out}")
        logger.print(f"Saved final weights under {save_dir}")
    return state


if __name__ == "__main__":
    main()
