"""Streaming generation: jitted prefill + jitted per-token step, Python
loop yields decoded text incrementally.

Serving equivalent of the reference's TextIteratorStreamer thread
(/root/reference/UniMP/pipeline/serve/model_worker.py:205-267): the
batched Generator compiles the whole decode into one program (best
throughput), while this class trades that for token-level latency so a
chat client sees words as they generate.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StreamingGenerator:
    def __init__(self, model, tokenizer, max_new_tokens: int = 256):
        self.model = model
        self.tok = tokenizer
        self.max_new = max_new_tokens
        self._prefill = None
        self._step = None

    def _build(self):
        model = self.model

        @jax.jit
        def prefill(params, ids, positions, latents, q_media):
            logits, kv = model.apply(
                {"params": params}, ids, latents=latents, q_media=q_media,
                positions=positions, return_kv=True,
            )
            return logits[:, -1], kv

        @jax.jit
        def step(params, tok, state, gen, step_idx, positions):
            ds = dict(state, gen=gen, step=step_idx)
            logits, gen = model.apply(
                {"params": params}, tok, positions=positions, decode_state=ds
            )
            return logits[:, 0], gen

        self._prefill, self._step = prefill, step

    def stream(
        self,
        params,
        prompt: str,
        vision_x: Optional[np.ndarray] = None,
        temperature: float = 0.0,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
    ) -> Iterator[str]:
        """Greedy (temperature=0) or sampled streaming decode; yields the
        accumulated generation text after each token."""
        if self._prefill is None:
            self._build()
        tok = self.tok
        max_new = max_new_tokens or self.max_new
        ids = jnp.asarray([tok.encode(prompt, add_bos=True)], jnp.int32)
        t = ids.shape[1]
        positions = jnp.arange(t, dtype=jnp.int32)[None, :]
        latents = q_media = None
        n_media = None
        kv_media = None
        if vision_x is not None:
            from unimp_tpu.models.flamingo import UniMPModel, compute_q_media

            latents = self.model.apply(
                {"params": params}, jnp.asarray(vision_x),
                method=type(self.model).encode_vision,
            )
            q_media = compute_q_media(ids, tok.media_token_id)
            n_media = q_media[:, -1]
            kv_media = type(self.model).kv_media_for(latents)

        logits, kv = self._prefill(params, ids, positions, latents, q_media)
        state = {
            "self": kv["self"],
            "xattn": kv.get("xattn", []),
            "kv_start": jnp.zeros((1,), jnp.int32),
            "n_media": n_media,
            "kv_media": kv_media,
        }
        gen = self.model.init_gen_caches(1, max_new)
        out_ids = []
        rng = jax.random.PRNGKey(seed)
        for i in range(max_new):
            if temperature > 0:
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
            else:
                nxt = jnp.argmax(logits, axis=-1)
            nxt = nxt.astype(jnp.int32)
            token_id = int(nxt[0])
            if token_id == tok.eos_token_id:
                break
            out_ids.append(token_id)
            yield tok.decode(out_ids)
            pos = jnp.full((1, 1), t + i, jnp.int32)
            logits, gen = self._step(
                params, nxt[:, None], state, gen, jnp.int32(i), pos
            )
