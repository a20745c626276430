"""Model worker: loads a checkpoint, streams generations over HTTP.

Capability parity with the reference worker
(/root/reference/UniMP/pipeline/serve/model_worker.py:51-313):
registration + heartbeat loop to the controller, a concurrency
semaphore, base64 image decode -> CLIP preprocessing, and a
NUL-delimited JSON chunk stream produced by the TPU streaming decoder
(jitted prefill + per-token step) instead of a torch generate thread.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from unimp_tpu.serve.constants import (
    STREAM_DELIMITER,
    WORKER_HEART_BEAT_INTERVAL,
)


class ModelWorker:
    def __init__(
        self,
        model,
        params,
        tokenizer,
        model_names,
        *,
        worker_addr: str = "",
        controller_addr: Optional[str] = None,
        limit_concurrency: int = 2,
        image_size: int = 224,
        max_new_tokens: int = 256,
        batched: bool = True,
        kv_int8: bool = False,
    ):
        from unimp_tpu.decode.streaming import StreamingGenerator

        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.model_names = list(model_names)
        self.worker_id = str(uuid.uuid4())[:6]
        self.worker_addr = worker_addr
        self.controller_addr = controller_addr
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.image_size = image_size
        # batched (default): concurrent streams share ONE device program
        # per token (serve/batching.py) instead of one program per token
        # per request — the reference's per-request generate threads
        # (model_worker.py:205-267) can't batch at all.
        self.streamer = None
        self.engine = None
        if batched:
            from unimp_tpu.serve.batching import BatchedStreamingEngine

            self.engine = BatchedStreamingEngine(
                model, tokenizer, max_slots=max(limit_concurrency, 1),
                max_new_tokens=max_new_tokens, kv_int8=kv_int8,
            )
        else:
            self.streamer = StreamingGenerator(model, tokenizer, max_new_tokens)
        self._queue = 0
        self._lock = threading.Lock()

    # ---------------- controller plumbing ----------------

    def status(self) -> dict:
        return {
            "model_names": self.model_names,
            "speed": 1,
            "queue_length": self._queue,
        }

    def register(self):
        if not self.controller_addr:
            return
        import requests

        requests.post(
            self.controller_addr + "/register_worker",
            json={
                "worker_name": self.worker_addr,
                "check_heart_beat": True,
                "worker_status": self.status(),
            },
            timeout=10,
        )

    def heartbeat_loop(self, stop: threading.Event):
        import requests

        while not stop.wait(WORKER_HEART_BEAT_INTERVAL):
            try:
                r = requests.post(
                    self.controller_addr + "/receive_heart_beat",
                    json={
                        "worker_name": self.worker_addr,
                        "queue_length": self._queue,
                    },
                    timeout=10,
                )
                if not r.json().get("exist", False):
                    self.register()  # model_worker.py:156-182
            except Exception:
                pass

    # ---------------- generation ----------------

    def _decode_images(self, images_b64):
        from PIL import Image

        from unimp_tpu.data.transforms import preprocess_image

        frames = []
        for s in images_b64:
            img = Image.open(io.BytesIO(base64.b64decode(s))).convert("RGB")
            frames.append(preprocess_image(np.asarray(img), self.image_size))
        # [1, M, H, W, 3]
        return np.stack(frames)[None].astype(np.float32)

    def generate_stream(self, req: dict):
        """Yields dict chunks {text, error_code}; final chunk has the
        full generation."""
        with self._lock:
            self._queue += 1
        acquired = self.semaphore.acquire(timeout=120)
        try:
            if not acquired:
                yield {"text": "server overloaded", "error_code": 1}
                return
            prompt = req["prompt"]
            vision = None
            if req.get("images"):
                vision = self._decode_images(req["images"])
            text = ""
            src = self.engine if self.engine is not None else self.streamer
            try:
                for text in src.stream(
                    self.params,
                    prompt,
                    vision_x=vision,
                    temperature=float(req.get("temperature", 0.0)),
                    max_new_tokens=req.get("max_new_tokens"),
                ):
                    yield {"text": text, "error_code": 0}
            except Exception as e:
                # wave-level failures (compile OOM, device error) arrive
                # as EngineError from the batched engine — report them
                # with an error code (reference worker semantics,
                # model_worker.py error chunks), never as generated text;
                # the full message goes to the server log only
                logging.getLogger("unimp.serve.worker").error(
                    "generation failed: %s", e)
                yield {"text": f"engine error: {type(e).__name__}",
                       "error_code": 1, "finish": True}
                return
            yield {"text": text, "error_code": 0, "finish": True}
        finally:
            if acquired:
                self.semaphore.release()
            with self._lock:
                self._queue -= 1


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _read(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path == "/worker_get_status":
                self._json(200, worker.status())
            elif self.path == "/worker_generate_stream":
                req = self._read()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                for chunk in worker.generate_stream(req):
                    self.wfile.write(
                        json.dumps(chunk).encode() + STREAM_DELIMITER
                    )
                    self.wfile.flush()
            else:
                self._json(404, {"error": "unknown route"})

    return Handler


def serve(worker: ModelWorker, host: str = "0.0.0.0", port: int = 21002):
    stop = threading.Event()
    if worker.controller_addr:
        worker.worker_addr = worker.worker_addr or f"http://{host}:{port}"
        worker.register()
        threading.Thread(
            target=worker.heartbeat_loop, args=(stop,), daemon=True
        ).start()
    server = ThreadingHTTPServer((host, port), make_handler(worker))
    print(f"[worker {worker.worker_id}] listening on {host}:{port}")
    try:
        server.serve_forever()
    finally:
        stop.set()


def main(argv=None):
    """Load a trained run directory and serve it."""
    import argparse

    import jax

    from unimp_tpu.cli import common
    from unimp_tpu.cli.arguments import build_parser

    p = build_parser(eval_only=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21002)
    p.add_argument("--controller-address", default=None)
    p.add_argument("--worker-address", default=None)
    p.add_argument("--limit-model-concurrency", type=int, default=2)
    p.add_argument("--no-batched-streaming", action="store_true",
                   help="fall back to one decode program per request")
    args = p.parse_args(argv)

    tokenizer = common.build_tokenizer(args)
    model = common.build_model(args, tokenizer)
    ds = common.make_dataset(args, tokenizer, "test", task=args.task)
    loader = common.make_loader(args, ds, tokenizer, train=False)
    from unimp_tpu.cli.mmrec_eval import init_params

    params = init_params(args, model, tokenizer, next(iter(loader)),
                         cast=args.eval_param_dtype in ("bf16", "int8"))
    if args.load_weights_name:
        from unimp_tpu.train import checkpoint as ckpt

        load_dir = args.load_dir or f"{args.external_save_dir or '.'}/{args.run_name}"
        params = ckpt.restore_params(load_dir, args.load_weights_name, like=params)
    if args.eval_param_dtype == "int8":
        # --eval_param_dtype=int8 == the reference worker's load_in_8bit
        # (model_worker.py:86-142): weight-only quantized serving
        from unimp_tpu.utils.quant import quantize_params_int8

        params = quantize_params_int8(params)

    worker = ModelWorker(
        model, params, tokenizer, [args.run_name],
        worker_addr=args.worker_address or f"http://localhost:{args.port}",
        controller_addr=args.controller_address,
        limit_concurrency=args.limit_model_concurrency,
        image_size=args.patch_image_size,
        batched=not args.no_batched_streaming,
        kv_int8=args.kv_int8,
    )
    serve(worker, args.host, args.port)


if __name__ == "__main__":
    main()
