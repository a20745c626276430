"""Training-throughput benchmark: samples/sec for the jitted train step.

Measures the full hot loop (uint8 images -> on-device normalize ->
vision tower -> gated-xattn LM -> focal loss -> backward -> AdamW) on
synthetic data, reporting samples/sec/chip — the reference's wandb
metric (mmrec.py:266-287). Run: python benchmarks/train_bench.py
"""

import dataclasses
import pathlib
import json
import os
import sys
import tempfile
import time

sys_path_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
import sys
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def main():
    import jax
    import jax.numpy as jnp

    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.parallel import make_mesh
    from unimp_tpu.tools import synth_data
    from unimp_tpu.train.optimizer import make_optimizer
    from unimp_tpu.train.trainer import Trainer

    variant = os.environ.get("BENCH_VARIANT", "small")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "0"))  # 0 = variant's
    remat = os.environ.get("BENCH_REMAT", "") == "1"
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "none")
    # reference protocol: vision tower + LM backbone frozen (open_flamingo
    # factory); BENCH_UNFREEZE=1 measures the full-model train step
    unfreeze = os.environ.get("BENCH_UNFREEZE", "") == "1"
    frozen_bf16 = os.environ.get("BENCH_FROZEN_BF16", "1") == "1"
    frozen_int8 = os.environ.get("BENCH_FROZEN_INT8", "") == "1"
    # bf16 grads + Adam moments: the single-chip memory configuration
    # for 3B-class training (state = 2F + 4T + 3*2T bytes vs 2F + 16T)
    bf16_state = os.environ.get("BENCH_BF16_STATE", "") == "1"
    # reference launch shape (unimp_task.sh:9-30): bsz 3 x grad-accum 2,
    # ~256-token prompts with 5-8 images
    accum = int(os.environ.get("BENCH_ACCUM", "1"))
    history = int(os.environ.get("BENCH_HISTORY", "5"))
    fixed_media = int(os.environ.get("BENCH_MEDIA", "5"))
    seq_shard = os.environ.get("BENCH_SEQ_SHARD", "") == "1"
    # BENCH_VISION_CACHE=1: precompute frozen-tower features per item
    # once (train/vision_cache.py) and stream image IDS — the reference
    # re-encodes the same item images every epoch
    vision_cache_on = os.environ.get("BENCH_VISION_CACHE", "") == "1"

    with tempfile.TemporaryDirectory() as d:
        synth_data.generate(d, n_items=128, n_users=64,
                            seq_len=history + 2,
                            image_size=image_size or 64)
        tok = synth_data.build_tokenizer(d, n_items=128)
        cfg = get_config(variant, remat=remat, remat_policy=remat_policy)
        if image_size:
            cfg = cfg.replace(
                vision=dataclasses.replace(cfg.vision, image_size=image_size)
            )
        cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 128))
        model = UniMPModel(cfg)
        ds = TaskDataset(d, "beauty", "rec", "train", tok, n_items=128,
                         history_len=history, image_size=cfg.vision.image_size,
                         load_images=not vision_cache_on)
        # the loader delivers accum microbatches at once; the trainer
        # scans them inside one jitted step (reference semantics:
        # micro-bsz x accum effective batch, unimp_task.sh:9-30)
        dl = DataLoader(ds, batch_size=batch * accum, pad_id=tok.pad_token_id,
                        num_workers=4,
                        pad_to_multiple=int(os.environ.get("BENCH_PAD", "128")),
                        fixed_media=fixed_media)
        mesh = make_mesh() if (len(jax.devices()) > 1 or seq_shard) else None
        if seq_shard:
            # --seq_shard routing (ring attention over the fsdp axis);
            # on one chip the ring has size 1 — this measures the
            # routing/shard_map overhead against the flash path
            from unimp_tpu.parallel import set_sequence_sharding

            set_sequence_sharding(mesh, seq_axis="fsdp", batch_axis="dp")
        from unimp_tpu.train.partition import backbone_trainable_mask

        trainer = Trainer(
            model, optimizer=None, media_id=tok.media_token_id,
            answer_id=tok.answer_token_id, endofchunk_id=tok.endofchunk_token_id,
            pad_id=tok.pad_token_id, use_reweight=True, mesh=mesh,
            trainable_mask=None if unfreeze else backbone_trainable_mask,
            frozen_dtype=("int8" if (frozen_int8 and not unfreeze)
                          else "bfloat16" if (frozen_bf16 and not unfreeze)
                          else None),
            grad_dtype="bfloat16" if bf16_state else None,
            # in-step scan accumulation (one grad buffer; see Trainer) —
            # optax.MultiSteps' extra acc tree does not fit at 3b/16 GB
            accum_steps=accum,
        )
        rng = jax.random.PRNGKey(0)
        sample = next(iter(dl))
        ids = jnp.asarray(sample["input_ids"])
        if vision_cache_on:
            assert not unfreeze, "vision cache requires the frozen tower"
        # abstract tree for the optimizer mask; real params are created
        # once inside init_state (sharded-from-birth when mesh is set)
        abstract = trainer.abstract_params(sample)
        n_params = sum(x.size for x in jax.tree.leaves(abstract))
        t_abs = trainer.trainable_abstract(sample)
        n_trainable = sum(x.size for x in jax.tree.leaves(t_abs))
        trainer.optimizer = make_optimizer(
            t_abs, learning_rate=1e-4,
            mu_dtype="bfloat16" if bf16_state else None,
            nu_dtype="bfloat16" if bf16_state else None,
        )
        state = trainer.init_state(rng, sample)
        if vision_cache_on:
            from unimp_tpu.train.vision_cache import build_tower_cache

            t_cache = time.perf_counter()
            trainer.vision_cache = build_tower_cache(
                model, state.params, ds.item_image, 128, chunk=64)
            cache_s = time.perf_counter() - t_cache
            print(f"[train_bench] tower cache built in {cache_s:.1f}s "
                  f"({trainer.vision_cache.nbytes / 2**20:.0f} MiB)",
                  file=sys.stderr)

        # warmup/compile (float() materializes; block_until_ready is not
        # a reliable sync point on the remote-tunnel TPU platform)
        state, m = trainer.train_step(state, sample)
        float(m["loss"])

        # BENCH_DEVICE_PREFETCH=1: double-buffer host->device transfers
        # (data/loader.py prefetch_to_device — the CLI train loop's
        # default); data_time is the torch-convention blocked-on-input
        # time (utils/profiling.py StepTimer, mmrec.py:99-105)
        device_prefetch = os.environ.get("BENCH_DEVICE_PREFETCH", "") == "1"

        def batches():
            while True:
                for b in dl:
                    yield b

        if device_prefetch:
            from unimp_tpu.data.loader import prefetch_to_device

            it = prefetch_to_device(batches(), trainer.device_batch)
        else:
            it = batches()
        t0 = time.perf_counter()
        done = 0
        data_s = 0.0
        for _ in range(steps):
            td = time.perf_counter()
            b = next(it)
            data_s += time.perf_counter() - td
            state, m = trainer.train_step(state, b)
            done += batch * accum
        float(m["loss"])
        dt = time.perf_counter() - t0

    from unimp_tpu.utils.flops import detect_peak_flops, train_step_flops

    step_flops = train_step_flops(cfg, batch * accum, int(ids.shape[1]),
                                  images_per_sample=fixed_media,
                                  frozen_backbone=not unfreeze,
                                  cached_vision=vision_cache_on)
    peak = detect_peak_flops()
    flops_per_sec = step_flops * steps / dt
    print(json.dumps({
        "metric": f"train_samples_per_sec_{variant}",
        "value": round(done / dt, 3),
        "unit": "samples/sec",
        "params": n_params,
        "trainable_params": n_trainable,
        "frozen_backbone": not unfreeze,
        "seq_len": int(ids.shape[1]),
        "image_size": cfg.vision.image_size,
        "loss": float(m["loss"]),
        "step_time_ms": round(dt / steps * 1e3, 1),
        "data_time_ms": round(data_s / steps * 1e3, 1),
        "data_time_share": round(data_s / dt, 4),
        "device_prefetch": device_prefetch,
        "model_tflops_per_step": round(step_flops / 1e12, 3),
        "mfu": round(flops_per_sec / peak, 4),
        "peak_tflops": peak / 1e12,
        "remat": remat,
        "remat_policy": remat_policy,
        "bf16_state": bf16_state,
        "frozen_int8": frozen_int8,
        "grad_accum": accum,
        "images_per_sample": fixed_media,
        "seq_shard": seq_shard,
        "vision_cache": vision_cache_on,
    }))


if __name__ == "__main__":
    main()
