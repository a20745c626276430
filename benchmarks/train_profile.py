"""Per-term attribution of the reference-shape training step.

Times, as separate jitted programs at the refshape (3b-mpt, bsz 3 x
accum 2, seq 256, 6 images @224):

  vision   — frozen CLIP tower forward over the step's 36 images
  fwd      — full loss forward (vision + resampler + LM + focal loss)
  fwd+bwd  — value_and_grad over the trainable subtree
  step     — the Trainer's real train step (grads + AdamW + guard)

The deltas attribute the step: bwd = (fwd+bwd) - fwd, optimizer+guard =
step - (fwd+bwd). Compare against analytic FLOPs (utils/flops.py) for a
per-term MFU roofline. Answers VERDICT r4 item 1 (the reference hot
loop at /root/reference/UniMP/mmrec.py:177-215).

Env: BENCH_VARIANT (3b-mpt), BENCH_FROZEN (int8|bfloat16),
BENCH_REMAT_POLICY (dots|none), BENCH_ATTN ("" = auto, xla, pallas),
BENCH_STEPS (10), BENCH_PROGRAMS (comma list of vision,fwd,fwdbwd,step,
data — default "vision,step,data"; each extra program is a separate
3B-scale XLA compile over the remote tunnel, ~10+ min apiece, so ask
only for the terms the question needs).
"""

import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def timed(fn, *args, steps=10, sync=None):
    out = fn(*args)
    (sync or (lambda o: jax_block(o)))(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    (sync or (lambda o: jax_block(o)))(out)
    return (time.perf_counter() - t0) / steps, out


def jax_block(out):
    import jax

    leaves = jax.tree.leaves(out)
    if leaves:
        float(leaves[0].ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models import UniMPModel, get_config
    from unimp_tpu.tools import synth_data
    from unimp_tpu.train.optimizer import make_optimizer
    from unimp_tpu.train.partition import backbone_trainable_mask
    from unimp_tpu.train.trainer import Trainer
    from unimp_tpu.utils import flops as F

    variant = os.environ.get("BENCH_VARIANT", "3b-mpt")
    frozen = os.environ.get("BENCH_FROZEN", "int8")
    policy = os.environ.get("BENCH_REMAT_POLICY", "dots")
    attn = os.environ.get("BENCH_ATTN", "")
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    programs = set(os.environ.get("BENCH_PROGRAMS",
                                  "vision,step,data").split(","))
    batch, accum, media, history = 3, 2, 6, 10
    if attn:
        os.environ["UNIMP_ATTN_IMPL"] = attn

    with tempfile.TemporaryDirectory() as d:
        synth_data.generate(d, n_items=128, n_users=64, seq_len=history + 2,
                            image_size=224)
        tok = synth_data.build_tokenizer(d, n_items=128)
        cfg = get_config(variant, remat=True, remat_policy=policy)
        cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 128))
        model = UniMPModel(cfg)
        ds = TaskDataset(d, "beauty", "rec", "train", tok, n_items=128,
                         history_len=history, image_size=224)
        dl = DataLoader(ds, batch_size=batch * accum, pad_id=tok.pad_token_id,
                        num_workers=4, pad_to_multiple=128, fixed_media=media)
        trainer = Trainer(
            model, optimizer=None, media_id=tok.media_token_id,
            answer_id=tok.answer_token_id, endofchunk_id=tok.endofchunk_token_id,
            pad_id=tok.pad_token_id, use_reweight=True,
            trainable_mask=backbone_trainable_mask,
            frozen_dtype=frozen, grad_dtype="bfloat16", accum_steps=accum,
        )
        rng = jax.random.PRNGKey(0)
        sample = next(iter(dl))
        t_abs = trainer.trainable_abstract(sample)
        trainer.optimizer = make_optimizer(t_abs, learning_rate=1e-4,
                                           mu_dtype="bfloat16",
                                           nu_dtype="bfloat16")
        state = trainer.init_state(rng, sample)
        dev = trainer._device_batch(sample)
        seq = int(dev["input_ids"].shape[1])

        report = {"variant": variant, "frozen": frozen,
                  "remat_policy": policy, "attn": attn or "auto",
                  "batch": batch, "accum": accum, "seq": seq,
                  "images_per_sample": media}

        # --- vision tower forward alone (uint8 -> normalize -> ViT) ---
        imgs = dev["images"]  # [B*accum, M, H, W, 3] uint8

        @jax.jit
        def vision_only(params, images):
            b, m = images.shape[:2]
            return model.apply(
                {"params": params}, normalize_on_device(images),
                method=UniMPModel.encode_vision)

        tv = None
        if "vision" in programs:
            tv, _ = timed(vision_only, state.params, imgs, steps=steps)
            report["vision_ms"] = round(tv * 1e3, 2)

        # --- full loss forward ---
        @jax.jit
        def fwd(params, b):
            return trainer._loss_fn(params, b)[0]

        tf_ = None
        if "fwd" in programs:
            tf_, _ = timed(fwd, state.params, dev, steps=steps)
            report["fwd_ms"] = round(tf_ * 1e3, 2)

        # --- fwd + bwd over trainable subtree (microbatch-scanned like
        # the real step) ---
        from unimp_tpu.train.partition import merge_params, partition_params

        mask = trainer.resolve_mask(state.params)
        t_params, f_params = partition_params(state.params, mask)

        @jax.jit
        def fwdbwd(tp, b):
            def split(x):
                return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

            mbs = jax.tree.map(split, b)
            gfn = jax.value_and_grad(
                lambda t, mb: trainer._loss_fn(merge_params(t, f_params), mb)[0])

            def body(carry, mb):
                l, g = gfn(tp, mb)
                return carry, None

            l0, g0 = gfn(tp, jax.tree.map(lambda x: x[0], mbs))
            _, _ = jax.lax.scan(body, 0.0, jax.tree.map(lambda x: x[1:], mbs))
            return l0, g0

        tb = None
        if "fwdbwd" in programs:
            tb, _ = timed(fwdbwd, t_params, dev, steps=steps)
            report["fwdbwd_ms"] = round(tb * 1e3, 2)

        # --- the real train step ---
        ts = None
        if "step" in programs:
            state, m = trainer.train_step(state, sample)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = trainer.train_step(state, sample)
            float(m["loss"])
            ts = (time.perf_counter() - t0) / steps
            report["step_ms"] = round(ts * 1e3, 2)

        # --- host input time (loader iteration, 1-core host) ---
        if "data" in programs:
            it = iter(dl)
            next(it)
            t0 = time.perf_counter()
            n = 0
            for b in it:
                n += 1
                if n >= min(steps, 8):
                    break
            report["data_ms_per_batch"] = round(
                (time.perf_counter() - t0) / max(n, 1) * 1e3, 2)

        # --- analytic attribution ---
        n_img = batch * accum * media
        vis_f = F.vision_forward_flops(cfg, n_img)
        step_f = F.train_step_flops(cfg, batch * accum, seq,
                                    images_per_sample=media,
                                    frozen_backbone=True)
        fwd_f = (F.lm_forward_flops(cfg, batch * accum, seq)
                 + F.xattn_forward_flops(cfg, batch * accum, seq,
                                         media * cfg.resampler.num_latents)
                 + vis_f + F.resampler_forward_flops(cfg, n_img))
        analytic = {
            "vision_tflops": round(vis_f / 1e12, 3),
            "fwd_tflops": round(fwd_f / 1e12, 3),
            "step_tflops": round(step_f / 1e12, 3),
        }
        if tv is not None:
            analytic["vision_mfu"] = round(vis_f / tv / 197e12, 4)
        if tf_ is not None:
            analytic["fwd_mfu"] = round(fwd_f / tf_ / 197e12, 4)
        if ts is not None:
            analytic["step_mfu"] = round(step_f / ts / 197e12, 4)
        if tb is not None and tf_ is not None:
            analytic["bwd_ms"] = round((tb - tf_) * 1e3, 2)
        if ts is not None and tb is not None:
            analytic["opt_guard_ms"] = round((ts - tb) * 1e3, 2)
        report["analytic"] = analytic
        print(json.dumps(report))


if __name__ == "__main__":
    main()
