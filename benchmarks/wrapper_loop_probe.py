"""Beam while_loop WRAPPER cost at 4b shapes, model stubbed out.

Round-4 attribution: the per-layer math accounts for ~18 ms/step
(combo_step_probe: composition is free), xattn ~1.3, lm_head ~0.5,
beam math ~0.2 — yet the real loop nets 30.8 ms/step
(records/decode_loop_prefill_4b_v5e.json). The single-call `step1`
stage can't compile through the tunnel (remote_compile broken pipe at
~30 min), so this probe isolates the while_loop wrapper from the other
side: it runs the REAL `BeamSearcher._beam_loop` — same carries
(including the full 2.62 GB of gen KV caches), same beam bookkeeping,
same ancestry updates — with `_decode_step` replaced by a stub that
does a cheap data-dependent logits matmul and (optionally) the real
per-layer cache writes.

  wrapper+writes  stub logits + 32 dynamic_update_slice cache writes
  wrapper_only    stub logits, gen caches carried through untouched

loop_step_net (30.8) - wrapper+writes - layer math (18) - xattn (1.3)
should be ~0 if the attribution is complete; a large wrapper+writes
number means the while_loop carry handling (cache aliasing) is the
missing term and the optimization target.

Env: PROBE_B (16), PROBE_K (10), PROBE_V (704), PROBE_T (128),
PROBE_MAXNEW (50), PROBE_REPS (5).
"""

import json
import os
import sys
import time

sys_path_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unimp_tpu.decode.sampler import GenerationConfig, Generator
    from unimp_tpu.models.lm import init_gen_cache
    from unimp_tpu.models.config import get_config
    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    b = int(os.environ.get("PROBE_B", "16"))
    k = int(os.environ.get("PROBE_K", "10"))
    v = int(os.environ.get("PROBE_V", "704"))
    t = int(os.environ.get("PROBE_T", "128"))
    max_new = int(os.environ.get("PROBE_MAXNEW", "50"))
    reps = int(os.environ.get("PROBE_REPS", "5"))
    cfg4b = get_config("4b").lm
    layers, hkv, hd = cfg4b.num_layers, (cfg4b.num_kv_heads
                                         or cfg4b.num_heads), cfg4b.head_dim
    bk = b * k

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((v, 128), np.float32) * 0.02,
                      jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((128, v), np.float32) * 0.02,
                        jnp.bfloat16)

    class StubModel:
        def init_gen_caches(self, batch, max_new, quantized=False):
            return [init_gen_cache(batch, max_new, cfg4b, jnp.bfloat16,
                                   quantized=quantized)
                    for _ in range(layers)]

    mode = {"write": True, "read": False}

    class StubSearcher(Generator):
        def _decode_step(self, params, tokens, state, gen, step, positions,
                         gen_index=None):
            x = emb[tokens[:, 0]]  # [BK, 128] data-dependent on the beam
            logits = jnp.dot(x, w_out,
                             preferred_element_type=jnp.float32)
            if mode["write"]:
                slab = jnp.broadcast_to(
                    x[:, None, None, :hd].astype(jnp.bfloat16),
                    (tokens.shape[0], hkv, 1, hd),
                )
                gen = [
                    {"k": jax.lax.dynamic_update_slice(
                        c["k"], slab, (0, 0, step, 0)),
                     "v": jax.lax.dynamic_update_slice(
                        c["v"], slab, (0, 0, step, 0))}
                    for c in gen
                ]
                if mode["read"]:
                    # dual-consumer pattern of the REAL layer: the updated
                    # cache feeds both the carry AND an attention read.
                    # The read here is one column (~1.6 MB/layer) so any
                    # large delta vs wrapper_writes is XLA COPYING the
                    # carried cache to keep the in-place update safe, not
                    # the read bytes themselves.
                    col = sum(
                        jnp.sum(jax.lax.dynamic_slice(
                            c[n], (0, 0, step, 0),
                            (tokens.shape[0], hkv, 1, hd),
                        ).astype(jnp.float32))
                        for c in gen for n in ("k", "v")
                    )
                    logits = logits + col * 1e-20
            return logits[:, None, :], gen

    gc = GenerationConfig(
        num_beams=k, num_return_sequences=k, max_new_tokens=max_new,
        eos_id=-1, pad_id=0, early_stopping=False,
    )
    searcher = StubSearcher(StubModel(), gc, media_id=-1)

    last_logits = jnp.asarray(rng.standard_normal((b, v), np.float32),
                              jnp.float32)
    start = jnp.zeros((b,), jnp.int32)
    seq_len = jnp.full((b,), t, jnp.int32)

    @jax.jit
    def dispatch(x):
        return x + 1.0

    def timed(fn, *args):
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.tree.map(lambda a: np.asarray(a), fn(*args))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    disp = timed(dispatch, jnp.zeros((), jnp.float32))
    log(f"[probe] dispatch {disp*1e3:.2f} ms")

    results = {"metric": "wrapper_loop_probe", "b": b, "k": k, "v": v,
               "max_new": max_new, "layers": layers,
               "gen_cache_gb": round(
                   layers * 2 * bk * hkv * max_new * hd * 2 / 1e9, 2),
               "dispatch_ms": round(disp * 1e3, 2)}

    for name, wr, rd in [("wrapper_writes_read", True, True),
                         ("wrapper_writes", True, False),
                         ("wrapper_only", False, False)]:
        mode["write"], mode["read"] = wr, rd
        fn = jax.jit(lambda ll, st, sl: searcher._beam_loop(
            {}, ll, {}, st, t, sl))
        try:
            s = timed(fn, last_logits, start, seq_len)
            per = max(s - disp, 0.0) / max_new
            results[name + "_ms"] = round(per * 1e3, 3)
            log(f"[probe] {name} {per*1e3:.2f} ms/step "
                f"(total {s*1e3:.0f} ms)")
        except Exception as e:
            log(f"[probe] {name} FAILED: {type(e).__name__}: {e}")
            results[name + "_ms"] = None

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
