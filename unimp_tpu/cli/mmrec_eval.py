"""Eval-only entry point — CLI parity with the reference's mmrec_eval.py.

Mirrors /root/reference/UniMP/mmrec_eval.py:303-798: same setup as the
trainer, loads ``--load_weights_name`` (Orbax directory produced by
mmrec, or a torch .pt via the converter), then runs the requested task
evaluations on the test split.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from unimp_tpu.cli import common
from unimp_tpu.cli.arguments import build_parser
from unimp_tpu.cli.mmrec import run_evals
from unimp_tpu.train import checkpoint as ckpt
from unimp_tpu.utils import MetricLogger


def init_params(args, model, tokenizer, sample_batch, cast: bool = False):
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models import compute_q_media

    rng = jax.random.PRNGKey(args.seed)
    ids = jnp.asarray(sample_batch["input_ids"])
    if "images" in sample_batch:
        images = jnp.asarray(sample_batch["images"])
    else:
        # id-only (latent-cache) batch: init only needs the shape
        import numpy as np

        b, m = sample_batch["image_ids"].shape
        s = args.patch_image_size
        images = jnp.asarray(np.zeros((b, m, s, s, 3), np.uint8))

    def init(rng):
        p = model.init(
            rng, ids,
            vision_x=normalize_on_device(images),
            q_media=compute_q_media(ids, tokenizer.media_token_id),
        )["params"]
        if cast:
            # cast INSIDE the init program: f32 buffers die as their bf16
            # copies appear, so a 3B model inits within a 16 GB chip
            from unimp_tpu.utils.inference import cast_params_for_inference

            p = cast_params_for_inference(p)
        return p

    return jax.jit(init)(rng)


def main(argv=None):
    args = build_parser(eval_only=True).parse_args(argv)
    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rank = jax.process_index()

    tokenizer = common.build_tokenizer(args)
    model = common.build_model(args, tokenizer)

    ds = common.make_dataset(args, tokenizer, "test", task=args.task)
    loader = common.make_loader(args, ds, tokenizer, train=False)
    probe = next(iter(loader))
    # the inference cast happens inside the init program (and checkpoint
    # restores target the already-cast tree) so f32 and bf16 copies of a
    # 3B model never coexist in HBM
    params = init_params(args, model, tokenizer, probe,
                         cast=args.eval_param_dtype in ("bf16", "int8"))

    if args.load_weights_name:
        load_dir = args.load_dir or os.path.join(
            args.external_save_dir or ".", args.load_run_name or args.run_name
        )
        if args.load_weights_name.endswith(".pt"):
            from unimp_tpu.tools.convert_torch import load_torch_checkpoint

            params = load_torch_checkpoint(
                os.path.join(load_dir, args.load_weights_name), params
            )
        else:
            params = ckpt.restore_params(
                load_dir, args.load_weights_name, like=params
            )
    if args.eval_param_dtype == "int8":
        # weight-only int8 AFTER restore (quantize the loaded weights);
        # bf16 source tree frees as the int8 copies appear leaf by leaf
        from unimp_tpu.utils.quant import quantize_params_int8

        params = quantize_params_int8(params)

    save_dir = os.path.join(args.external_save_dir or ".", args.run_name)
    logger = MetricLogger(save_dir, f"{args.run_name}_eval", rank=rank,
                          use_wandb=args.report_to_wandb,
                          wandb_project=args.wandb_project,
                          wandb_entity=args.wandb_entity, config=vars(args))
    mesh = common.build_mesh(args)
    tasks = [args.task] if args.single_task else None
    results = {}
    shared_cache = {}  # one latent cache across both splits
    if args.do_eval:
        results["eval"] = run_evals(args, model, params, tokenizer, logger,
                                    epoch=0, tasks=tasks, split="eval",
                                    mesh=mesh, cache_holder=shared_cache)
    if args.do_test or not args.do_eval:
        results.update(run_evals(args, model, params, tokenizer, logger,
                                 epoch=0, tasks=tasks, split="test",
                                 mesh=mesh, cache_holder=shared_cache))
    if rank == 0:
        out = os.path.join(save_dir, "eval_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        logger.print(f"Wrote {out}")
    return results


if __name__ == "__main__":
    main()
