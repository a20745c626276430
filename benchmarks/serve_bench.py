"""Serving throughput: streamed tokens/s through the controller+worker.

Boots the full serving stack in-process (stdlib HTTP controller +
ModelWorker, like production minus the network hops between machines),
fires C concurrent chat requests through the controller's stream proxy,
and reports time-to-first-token and aggregate generated tokens/s.

The reference's serving stack (FastAPI controller + model_worker,
/root/reference/UniMP/pipeline/serve/) streams one request per
semaphore slot with a threaded HF generate; here the worker drives the
compiled Generator (whole-loop jit), so per-request cost after the
first compile is one device program.

Env: BENCH_VARIANT (debug|small, default small), BENCH_CONCURRENCY,
BENCH_REQUESTS, BENCH_MAX_NEW. Prints ONE JSON line.
"""

import dataclasses
import json
import os
import sys
import tempfile
import threading
import time
from http.server import ThreadingHTTPServer

sys_path_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.serve.cli_chat import stream_request
    from unimp_tpu.serve.controller import Controller
    from unimp_tpu.serve.controller import make_handler as controller_handler
    from unimp_tpu.serve.worker import ModelWorker
    from unimp_tpu.serve.worker import make_handler as worker_handler
    from unimp_tpu.tools import synth_data

    variant = os.environ.get("BENCH_VARIANT", "small")
    concurrency = int(os.environ.get("BENCH_CONCURRENCY", "4"))
    n_requests = int(os.environ.get("BENCH_REQUESTS", "16"))
    max_new = int(os.environ.get("BENCH_MAX_NEW", "32"))

    with tempfile.TemporaryDirectory() as d:
        synth_data.generate(d, n_items=64, n_users=4, image_size=64,
                            write_images=False)
        tok = synth_data.build_tokenizer(d, n_items=64)
    cfg = get_config(variant)
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 64))
    model = UniMPModel(cfg)
    ids = jnp.ones((1, 16), jnp.int32).at[0, 1].set(tok.media_token_id)
    img = cfg.vision.image_size
    from unimp_tpu.utils.inference import cast_params_for_inference

    params = jax.jit(
        lambda r: cast_params_for_inference(model.init(
            r, ids, vision_x=jnp.zeros((1, 1, img, img, 3), jnp.float32),
            q_media=compute_q_media(ids, tok.media_token_id),
        )["params"])
    )(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_QUANT", "") == "int8":
        # --eval_param_dtype=int8 parity (the reference worker's
        # load_in_8bit, model_worker.py:86-142) — required to fit the
        # 4b variant's weights for serving on one 16 GB chip
        from unimp_tpu.utils.quant import quantize_params_int8

        params = quantize_params_int8(params)
        print("[serve_bench] int8 weight-only params", file=sys.stderr)

    batched = os.environ.get("BENCH_UNBATCHED", "") != "1"
    worker = ModelWorker(model, params, tok, [variant], image_size=img,
                         max_new_tokens=max_new,
                         limit_concurrency=concurrency,
                         batched=batched)
    wsrv = ThreadingHTTPServer(("127.0.0.1", 0), worker_handler(worker))
    threading.Thread(target=wsrv.serve_forever, daemon=True).start()
    ctrl = Controller()
    ctrl.register_worker(
        f"http://127.0.0.1:{wsrv.server_address[1]}", False, worker.status()
    )
    csrv = ThreadingHTTPServer(("127.0.0.1", 0), controller_handler(ctrl))
    threading.Thread(target=csrv.serve_forever, daemon=True).start()
    addr = f"http://127.0.0.1:{csrv.server_address[1]}"

    prompts = [
        f"I bought item_{3 + i} and item_{7 + i}. What should I buy next?"
        for i in range(n_requests)
    ]

    def one(prompt, out):
        t0 = time.perf_counter()
        ttft = None
        text = ""
        for ch in stream_request(
            addr, {"model": variant, "prompt": prompt,
                   "max_new_tokens": max_new},
        ):
            if ch.get("error_code", 0) != 0:
                out.append({"error": ch})
                return
            if ttft is None and ch.get("text"):
                ttft = time.perf_counter() - t0
            text = ch.get("text", text)
        out.append({
            "ttft": ttft if ttft is not None else time.perf_counter() - t0,
            "wall": time.perf_counter() - t0,
            "tokens": len(tok.encode(text)) if text else 0,
        })

    # warmup/compile: one request end-to-end
    log("[serve_bench] warmup (compile) ...")
    warm = []
    one(prompts[0], warm)
    assert warm and "error" not in warm[0], warm

    log(f"[serve_bench] {n_requests} requests, concurrency {concurrency} ...")
    results = []
    t0 = time.perf_counter()
    sem = threading.Semaphore(concurrency)

    def worker_thread(p):
        with sem:
            one(p, results)

    threads = [threading.Thread(target=worker_thread, args=(p,))
               for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    errors = [r for r in results if "error" in r]
    oks = [r for r in results if "error" not in r]
    total_tokens = sum(r["tokens"] for r in oks)
    out = {
        "metric": f"serve_tokens_per_sec_{variant}",
        "value": round(total_tokens / wall, 3),
        "unit": "tokens/sec",
        "requests_per_sec": round(len(oks) / wall, 3),
        "ttft_p50_ms": (round(
            sorted(r["ttft"] for r in oks)[len(oks) // 2] * 1e3, 1
        ) if oks else None),
        "concurrency": concurrency,
        "max_new_tokens": max_new,
        "batched_streaming": batched,
        "errors": len(errors),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
