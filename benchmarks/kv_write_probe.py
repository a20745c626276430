"""Is the per-layer gen-KV dynamic_update_slice write in-place?

Round-4 accounting: weights stream at the HBM floor
(weight_stream_probe: 812 GB/s) and decode attention is ~8.5 ms
(gen_ancestry_probe), yet the measured 4b decode step is ~7-10 ms
heavier than the sum of parts. The remaining suspect with the right
magnitude is the gen-cache write: every layer does
``dynamic_update_slice(cache, col, (0, 0, 0, step, 0))`` on a
[2, 160, 32, 50, 80] cache inside the decode while_loop — in-place it
is ~1.6 MB/layer; as a copy it is ~82 MB read+write per layer
(2.6 GB/step across 32 layers ≈ 7.4 ms).

Candidates (per sweep over LAYERS cache replicas, carried through a
fori_loop so XLA's aliasing machinery sees the real structure):

  write_only      dus a fresh column into each cache, carry forward,
                  read back a single element (forces materialization)
  write_and_read  dus, then an attention-shaped einsum over a G-chunk
                  of the updated cache (mimics decode_attention
                  consuming gen_kv right after the write), carry
  read_only       the einsum alone on static caches (baseline to
                  subtract)

If write_only costs ~0, the dus aliases and the mystery lives
elsewhere; if it costs ~milliseconds, the decode loop is paying a full
cache copy per layer per step.

Env: PROBE_LAYERS (8), PROBE_INNER (16), PROBE_REPS (7), PROBE_G (50).
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

    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    bk, hkv, d = 160, 32, 80
    g = int(os.environ.get("PROBE_G", "50"))
    layers = int(os.environ.get("PROBE_LAYERS", "8"))
    inner = int(os.environ.get("PROBE_INNER", "16"))
    reps = int(os.environ.get("PROBE_REPS", "7"))
    chunk = 16

    rng = np.random.default_rng(0)
    caches = [jnp.asarray(
        rng.standard_normal((2, bk, hkv, g, d), dtype=np.float32),
        jnp.bfloat16) for _ in range(layers)]
    q = jnp.asarray(rng.standard_normal((bk, hkv, d), dtype=np.float32),
                    jnp.bfloat16)
    cache_gb = layers * 2 * bk * hkv * g * d * 2 / 1e9

    def timed(fn, *args):
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                     out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*args)
            np.asarray(r[0] if isinstance(r, tuple) else r)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    @jax.jit
    def dispatch(x):
        return x + 1.0

    disp = timed(lambda x: dispatch(x), jnp.zeros((), jnp.float32))
    log(f"[probe] dispatch {disp*1e3:.2f} ms")

    def read_chunk(c, start):
        ks = jax.lax.dynamic_slice(
            c, (0, 0, 0, start, 0), (1, bk, hkv, chunk, d))[0]
        return jnp.einsum("bhd,bhcd->bhc", q, ks,
                          preferred_element_type=jnp.float32)

    def make(write, read):
        def run(x0, caches):
            def body(i, carry):
                acc, caches = carry
                col = (x0 * (1.0 + acc * 1e-20))  # [2, BK, Hkv, 1, D]
                step_i = i % g
                out = []
                for c in caches:
                    if write:
                        c = jax.lax.dynamic_update_slice(
                            c, col.astype(c.dtype), (0, 0, 0, step_i, 0))
                    if read:
                        acc = acc + jnp.sum(read_chunk(c, (i * chunk) % (g - chunk)))
                    else:
                        acc = acc + c[0, 0, 0, step_i, 0].astype(jnp.float32)
                    out.append(c)
                return acc, out
            acc, caches = jax.lax.fori_loop(
                0, inner, body, (jnp.float32(0.0), caches))
            return acc, caches[0][0, 0, 0, 0, 0]
        return run

    col0 = jnp.ones((2, bk, hkv, 1, d), jnp.bfloat16)

    results = {"metric": "kv_write_probe", "layers": layers, "g": g,
               "inner": inner, "cache_gb": round(cache_gb, 3),
               "dispatch_ms": round(disp * 1e3, 2)}

    for name, write, read in [("write_only", True, False),
                              ("write_and_read", True, True),
                              ("read_only", False, True)]:
        try:
            jfn = jax.jit(make(write, read))
            s = max(timed(jfn, col0, caches) - disp, 1e-6)
            per = s / inner
            results[name + "_ms"] = round(per * 1e3, 3)
            log(f"[probe] {name} {per*1e3:.3f} ms/sweep")
        except Exception as e:
            log(f"[probe] {name} FAILED: {type(e).__name__}: {e}")
            results[name + "_ms"] = None

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
