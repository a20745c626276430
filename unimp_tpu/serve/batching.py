"""Server-side batched streaming decode (continuous-batching lite).

The reference worker decodes every request independently on its own
thread (model_worker.py:205-267 + a concurrency semaphore), and round-2
serving measurements showed the same design here is dispatch-bound over
the device tunnel: one device program per token PER REQUEST. This engine
batches concurrent streams into ONE device program per token:

  * requests are collected into a WAVE (up to ``max_slots``, waiting at
    most ``wave_window_ms`` after the first arrival — TTFT cost is
    bounded and tiny next to prefill)
  * the wave's prompts are left-aligned into one bucketed window (the
    same layout the batched eval sampler uses, decode/sampler.py) and
    prefilled in one program
  * the decode loop runs CHUNKED: ``lax.scan`` advances CHUNK tokens for
    ALL rows inside one device program (sampling fused in — the next
    input token never visits the host), and each chunk returns one
    packed [S, CHUNK, 2] (token, done) array = ONE host fetch per CHUNK
    tokens. Over the remote-tunnel device link every dispatch/fetch is
    a ~15 ms round trip, so per-token host loops cap out near
    1000/15 ≈ 66 steps/s no matter how small the model; chunking is
    what actually lifts serving throughput past the link latency.
  * the host streams each chunk's tokens per-row to the consumer
    queues; rows retire on EOS / their own max_new. The next chunk is
    dispatched before the previous one is drained (runahead 1), so the
    device computes while the host decodes text.

Per-row sampling parameters are data, not trace constants: temperature
is a [S] array (0 = argmax) so mixed greedy/sampled requests share one
compiled step. Compiled shapes are cached by (slots, prompt-bucket,
media-bucket, max_new-bucket, chunk) so steady-state traffic reuses one
executable.
"""

from __future__ import annotations

import functools
import os
import queue
import threading
import time
from typing import Optional

import numpy as np

_END = object()


class EngineError(RuntimeError):
    """A wave failed wholesale (compile OOM, device error). Raised out of
    ``stream()`` so callers surface it with an error code instead of
    streaming the exception text as if it were generated tokens."""


class _Request:
    def __init__(self, params, prompt_ids, vision, max_new, temperature, seed):
        self.params = params
        self.prompt_ids = prompt_ids
        self.vision = vision  # [M, H, W, 3] float or None
        self.max_new = max_new
        self.temperature = temperature
        self.seed = seed
        self.out: "queue.Queue" = queue.Queue()


class BatchedStreamingEngine:
    def __init__(self, model, tokenizer, *, max_slots: int = 4,
                 max_new_tokens: int = 256, wave_window_ms: float = 30.0,
                 prompt_bucket: int = 64, chunk: int = 8,
                 kv_int8: bool = False):
        self.model = model
        self.tok = tokenizer
        self.max_slots = max_slots
        self.max_new = max_new_tokens
        self.window = wave_window_ms / 1000.0
        self.prompt_bucket = prompt_bucket
        self.chunk = max(1, chunk)
        # int8 prompt/latent/gen KV: decode streams every cache fully
        # each step, so halving its bytes shaves the HBM-bound step — but
        # ONLY under the fused Pallas kernels, which dequantize in VMEM.
        # Under the default XLA impl the dequantized copies materialize
        # per step (measured ~25% slower at 4b, benchmarks/RESULTS.md),
        # so kv_int8 pins the Pallas decode impl for the wave programs.
        self.kv_int8 = kv_int8
        import jax

        # TPU-only auto-pin: elsewhere "pallas" selects interpret mode
        # (orders of magnitude slower); explicit UNIMP_DECODE_IMPL wins.
        self.attn_impl = (
            "pallas" if (kv_int8 and not os.environ.get("UNIMP_DECODE_IMPL")
                         and jax.default_backend() == "tpu")
            else None
        )
        self._inbox: "queue.Queue" = queue.Queue()
        self._fns = {}
        self._encode_fn = None
        self._thread = None
        self._stop = threading.Event()
        self._lock = threading.Lock()

    # ---------------- public ----------------

    def start(self):
        with self._lock:
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._loop, daemon=True
                )
                self._thread.start()

    def stop(self):
        self._stop.set()
        self._inbox.put(None)

    def queue_depth(self) -> int:
        return self._inbox.qsize()

    def stream(self, params, prompt: str, vision_x=None,
               temperature: float = 0.0,
               max_new_tokens: Optional[int] = None, seed: int = 0):
        """Iterator of accumulated generation text (same surface as
        StreamingGenerator.stream) — but served from the shared wave."""
        self.start()
        ids = self.tok.encode(prompt, add_bos=True)
        vision = None
        if vision_x is not None:
            vision = np.asarray(vision_x)
            if vision.ndim == 5:  # [1, M, H, W, 3] -> [M, H, W, 3]
                vision = vision[0]
        req = _Request(params, ids, vision,
                       int(max_new_tokens or self.max_new),
                       float(temperature), seed)
        self._inbox.put(req)
        while True:
            item = req.out.get()
            if item is _END:
                return
            if isinstance(item, EngineError):
                raise item
            yield item

    # ---------------- wave formation ----------------

    def _loop(self):
        while not self._stop.is_set():
            first = self._inbox.get()
            if first is None:
                continue
            reqs = [first]
            deadline = time.monotonic() + self.window
            while len(reqs) < self.max_slots:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self._inbox.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is not None:
                    reqs.append(nxt)
            try:
                self._run_wave(reqs)
            except Exception as e:
                # deliver as an ERROR, not as generation text: a jax
                # RESOURCE_EXHAUSTED message is kilobytes long, and a
                # client that can't tell it from tokens reports garbage
                # throughput (this exact failure was observed at 16
                # slots x 4b, records/serve_4b_c16_v5e.json)
                for r in reqs:
                    r.out.put(EngineError(str(e)))
                    r.out.put(_END)

    # ---------------- compiled programs ----------------

    def _build(self, key):
        import jax
        import jax.numpy as jnp

        model = self.model
        eos_id = self.tok.eos_token_id
        pad_id = self.tok.pad_token_id
        t = key[1]

        @jax.jit
        def prefill(params, ids, kv_start, positions, latents, q_media):
            from unimp_tpu.models.flamingo import UniMPModel

            kv_media = n_media = None
            if latents is not None:
                kv_media = UniMPModel.kv_media_for(latents)
                n_media = q_media[:, -1]
            logits, kv = model.apply(
                {"params": params}, ids, latents=latents, q_media=q_media,
                kv_start=kv_start, positions=positions, return_kv=True,
                last_logit_only=True,
            )
            self_kv = kv["self"]
            xattn_kv = kv.get("xattn", [])
            if self.kv_int8:
                from unimp_tpu.decode.sampler import quantize_kv_cache

                self_kv = [quantize_kv_cache(c) for c in self_kv]
                xattn_kv = [quantize_kv_cache(c) for c in xattn_kv]
            state = {
                "self": self_kv,
                "xattn": xattn_kv,
                "kv_start": kv_start,
                "n_media": n_media,
                "kv_media": kv_media,
            }
            return logits[:, -1], state

        chunk = key[4]

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def decode_chunk(params, state, gen, logits, done, seeds, temps,
                         step0, kv_start):
            """Advance CHUNK tokens in ONE program: sampling is fused so
            the next step's input token never visits the host, and the
            chunk's emitted (token, done) pairs come back as a single
            packed int32 array — one device fetch per CHUNK tokens
            instead of one dispatch + one fetch per token (the ~15 ms
            tunnel round trips were the serving bottleneck)."""

            def body(carry, i):
                logits, gen, done = carry
                step_i = step0 + i
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                scaled = logits / jnp.maximum(temps[:, None], 1e-6)
                # per-row keys from each request's OWN seed (requests
                # batched into one wave keep independent, reproducible
                # sampling streams)
                base = jax.random.PRNGKey(0)
                keys = jax.vmap(
                    lambda sd: jax.random.fold_in(
                        jax.random.fold_in(base, sd), step_i)
                )(seeds)
                sampled = jax.vmap(
                    lambda k, l: jax.random.categorical(k, l)
                )(keys, scaled).astype(jnp.int32)
                nxt = jnp.where(temps > 0, sampled, greedy)
                emit = jnp.where(done, pad_id, nxt)
                new_done = done | (emit == eos_id)
                pos = (t + step_i - kv_start)[:, None]
                ds = dict(state, gen=gen, step=step_i, gen_index=None,
                          attn_impl=self.attn_impl)
                new_logits, gen = model.apply(
                    {"params": params}, emit[:, None], positions=pos,
                    decode_state=ds,
                )
                return (new_logits[:, 0], gen, new_done), (emit, new_done)

            (logits, gen, done), (emits, dones) = jax.lax.scan(
                body, (logits, gen, done),
                jnp.arange(chunk, dtype=jnp.int32),
            )
            packed = jnp.stack(
                [emits.T, dones.T.astype(jnp.int32)], axis=-1
            )  # [S, CHUNK, 2] — one fetch
            return logits, done, gen, packed, step0 + chunk

        self._fns[key] = (prefill, decode_chunk)
        return self._fns[key]

    # ---------------- the wave ----------------

    def _run_wave(self, reqs):
        import jax
        import jax.numpy as jnp

        from unimp_tpu.models.flamingo import compute_q_media

        tok = self.tok
        params = reqs[0].params  # one model per worker
        s = self.max_slots
        n = len(reqs)
        pad_id = tok.pad_token_id

        t_max = max(len(r.prompt_ids) for r in reqs)
        t = -(-t_max // self.prompt_bucket) * self.prompt_bucket
        m = max((0 if r.vision is None else r.vision.shape[0] for r in reqs),
                default=0)
        chunk = min(self.chunk, max(r.max_new for r in reqs))
        # gen window bucketed to a chunk multiple: the scan never writes
        # past the cache and the compile key stays coarse
        g = -(-max(r.max_new for r in reqs) // chunk) * chunk

        # left-aligned prompt window (suffix-aligned, like the sampler)
        ids = np.full((s, t), pad_id, np.int32)
        kv_start = np.full((s,), t, np.int32)
        for i, r in enumerate(reqs):
            ln = len(r.prompt_ids)
            ids[i, t - ln:] = r.prompt_ids
            kv_start[i] = t - ln
        positions = np.maximum(
            np.arange(t, dtype=np.int32)[None, :] - kv_start[:, None], 0
        )
        temps = np.zeros((s,), np.float32)
        for i, r in enumerate(reqs):
            temps[i] = r.temperature

        latents = q_media = None
        if m > 0:
            img = None
            for r in reqs:
                if r.vision is not None:
                    img = r.vision.shape[1:]
                    break
            vision = np.zeros((s, m) + img, np.float32)
            for i, r in enumerate(reqs):
                if r.vision is not None:
                    vision[i, : r.vision.shape[0]] = r.vision
            if self._encode_fn is None:
                self._encode_fn = jax.jit(
                    lambda p, v: self.model.apply(
                        {"params": p}, v, method=type(self.model).encode_vision
                    )
                )
            latents = self._encode_fn(params, jnp.asarray(vision))
            q_media = compute_q_media(jnp.asarray(ids), tok.media_token_id)

        key = (s, t, m, g, chunk)
        prefill, decode_chunk = self._fns.get(key) or self._build(key)

        logits, state = prefill(
            params, jnp.asarray(ids), jnp.asarray(kv_start),
            jnp.asarray(positions), latents, q_media,
        )
        gen = self.model.init_gen_caches(s, g, quantized=self.kv_int8)
        seeds_d = jnp.asarray(
            [r.seed for r in reqs] + [0] * (s - n), jnp.int32)
        temps_d = jnp.asarray(temps)
        kv_start_d = jnp.asarray(kv_start)
        done_d = jnp.asarray(np.arange(s) >= n)  # inactive slots retired
        step0 = jnp.int32(0)  # advanced ON DEVICE: no per-chunk upload

        from collections import deque

        out_ids = [[] for _ in range(s)]
        host_done = [i >= n for i in range(s)]
        pending = deque()  # packed [S, CHUNK, 2] handles
        prev_done = np.asarray(done_d)
        n_chunks = g // chunk
        dispatched = 0

        def drain_chunk():
            nonlocal prev_done
            pk = np.asarray(pending.popleft())  # one fetch per chunk
            for c in range(pk.shape[1]):
                for j, r in enumerate(reqs):
                    if host_done[j]:
                        continue
                    token = int(pk[j, c, 0])
                    dn = bool(pk[j, c, 1])
                    if (not prev_done[j] and not dn
                            and len(out_ids[j]) < r.max_new):
                        out_ids[j].append(token)
                        r.out.put(tok.decode(out_ids[j]))
                    if dn or len(out_ids[j]) >= r.max_new:
                        host_done[j] = True
                        r.out.put(_END)
                prev_done = pk[:, c, 1].astype(bool)

        # runahead 1: the next chunk computes while the host decodes +
        # streams the previous one's text
        while dispatched < n_chunks and not all(host_done):
            logits, done_d, gen, packed, step0 = decode_chunk(
                params, state, gen, logits, done_d, seeds_d, temps_d,
                step0, kv_start_d,
            )
            pending.append(packed)
            dispatched += 1
            if len(pending) >= 2:
                drain_chunk()
        while pending and not all(host_done):
            drain_chunk()
        pending.clear()
        for j, r in enumerate(reqs):
            if not host_done[j]:
                host_done[j] = True
                r.out.put(_END)
