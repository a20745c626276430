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

    with tempfile.TemporaryDirectory() as d:
        synth_data.generate(d, n_items=128, n_users=64, image_size=64)
        tok = synth_data.build_tokenizer(d, n_items=128)
        cfg = get_config(variant)
        cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 128))
        model = UniMPModel(cfg)
        ds = TaskDataset(d, "beauty", "rec", "train", tok, n_items=128,
                         history_len=5, image_size=cfg.vision.image_size)
        dl = DataLoader(ds, batch_size=batch, pad_id=tok.pad_token_id,
                        num_workers=4, pad_to_multiple=128, fixed_media=5)
        mesh = make_mesh() if len(jax.devices()) > 1 else None
        trainer = Trainer(
            model, optimizer=None, media_id=tok.media_token_id,
            answer_id=tok.answer_token_id, endofchunk_id=tok.endofchunk_token_id,
            pad_id=tok.pad_token_id, use_reweight=True, mesh=mesh,
        )
        rng = jax.random.PRNGKey(0)
        sample = next(iter(dl))
        ids = jnp.asarray(sample["input_ids"])
        params = model.init(
            rng, ids,
            vision_x=normalize_on_device(jnp.asarray(sample["images"])),
            q_media=compute_q_media(ids, tok.media_token_id),
        )["params"]
        n_params = sum(x.size for x in jax.tree.leaves(params))
        trainer.optimizer = make_optimizer(params, learning_rate=1e-4)
        state = trainer.init_state(rng, sample)

        # warmup/compile (float() materializes; block_until_ready is not
        # a reliable sync point on the remote-tunnel TPU platform)
        state, m = trainer.train_step(state, sample)
        float(m["loss"])
        t0 = time.perf_counter()
        it = iter(dl)
        done = 0
        for _ in range(steps):
            try:
                b = next(it)
            except StopIteration:
                it = iter(dl)
                b = next(it)
            state, m = trainer.train_step(state, b)
            done += batch
        float(m["loss"])
        dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"train_samples_per_sec_{variant}",
        "value": round(done / dt, 3),
        "unit": "samples/sec",
        "params": n_params,
        "seq_len": int(ids.shape[1]),
        "loss": float(m["loss"]),
    }))


if __name__ == "__main__":
    main()
