"""Merged [2,BK,H,G,D] vs split K/V gen-cache layout under live decode.

Round-4 layer-scaling run (PROFILE_NUM_LAYERS=8: loop_step_net 8.51 ms
→ slope 0.93 ms/layer vs the combo replica's ~0.69) leaves ~0.24
ms/layer unattributed. Prime suspect: the production layer stores the
gen cache MERGED ([2, BK, Hkv, G, D], models/lm.py init_gen_cache — the
round-2 "one kernel per layer" rationale) and reads it back as
`gen_kv[0]` / `gen_kv[1]`. A dot_general operand cannot fuse a slice,
so XLA materializes both halves per layer per step — at 4b that is
82 MB/layer → ~2.6 GB/step of pure copy traffic the split layout never
pays. The combo/ancestry probes all passed SPLIT arrays, which is why
no probe saw it.

This probe times the REAL per-layer decode pattern (DUS write of the
current token's K/V, then full `decode_attention` on the updated cache)
with the cache loop-carried through an amortized fori, in both layouts:

  merged  one [2, BK, H, G, D] array per layer; one DUS; attention
          reads c[0], c[1] (the production pattern)
  split   separate K and V arrays; two DUS; attention reads directly

Env: PROBE_FILL (25), PROBE_LAYERS (8), PROBE_INNER (12),
PROBE_REPS (7).
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

    from unimp_tpu.ops.decode_attention import decode_attention
    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if os.environ.get("PROBE_VARIANT", "4b") == "small":
        # small-variant decode shapes (LMConfig _SMALL_LM: 8 heads x 64,
        # bench.py small eval: batch 32, 10 beams)
        b, kb, h, d, t, g = 32, 10, 8, 64, 128, 50
    else:
        b, kb, h, d, t, g = 16, 10, 32, 80, 128, 50
    bk = b * kb
    fill = int(os.environ.get("PROBE_FILL", "25"))
    layers = int(os.environ.get("PROBE_LAYERS", "8"))
    inner = int(os.environ.get("PROBE_INNER", "12"))
    reps = int(os.environ.get("PROBE_REPS", "7"))

    rng = np.random.default_rng(0)

    def mk(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32), dtype)

    pks = [mk(b, h, t, d) for _ in range(layers)]
    pvs = [mk(b, h, t, d) for _ in range(layers)]
    merged = [mk(2, bk, h, g, d) for _ in range(layers)]
    split_k = [c[0] for c in merged]
    split_v = [c[1] for c in merged]
    sel = jnp.asarray(rng.integers(0, kb, (bk, g)), jnp.int32)
    q0 = mk(bk, h, d)
    slab = mk(2, bk, h, 1, d)

    def timed(fn, *args):
        out = fn(*args)
        float(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    @jax.jit
    def dispatch(x):
        return x + 1.0

    disp = timed(dispatch, jnp.zeros((), jnp.float32))
    log(f"[probe] dispatch {disp*1e3:.2f} ms")

    step0 = jnp.int32(fill)

    def merged_sweep(q, step, caches):
        outs = []
        new = []
        for c, pk, pv in zip(caches, pks, pvs):
            c = jax.lax.dynamic_update_slice(c, slab, (0, 0, 0, step, 0))
            o = decode_attention(
                q, pk, pv, c[0], c[1], step=step + 1, beam_sel=sel,
                gen_chunk=0, impl="xla",
            )
            outs.append(jnp.sum(o.astype(jnp.float32)))
            new.append(c)
        return sum(outs), new

    def split_sweep(q, step, ks, vs):
        outs = []
        nk, nv = [], []
        for k, v, pk, pv in zip(ks, vs, pks, pvs):
            k = jax.lax.dynamic_update_slice(k, slab[0], (0, 0, step, 0))
            v = jax.lax.dynamic_update_slice(v, slab[1], (0, 0, step, 0))
            o = decode_attention(
                q, pk, pv, k, v, step=step + 1, beam_sel=sel,
                gen_chunk=0, impl="xla",
            )
            outs.append(jnp.sum(o.astype(jnp.float32)))
            nk.append(k)
            nv.append(v)
        return sum(outs), nk, nv

    def amortize_merged(q, step, caches):
        def body(i, carry):
            acc, caches = carry
            shift = jnp.int32(jnp.abs(acc) * 1e-20)
            s, caches = merged_sweep(q * (1.0 + acc * 1e-20), step + shift,
                                     caches)
            return acc + s, caches
        acc, _ = jax.lax.fori_loop(0, inner, body,
                                   (jnp.float32(0.0), caches))
        return acc

    def amortize_split(q, step, ks, vs):
        def body(i, carry):
            acc, ks, vs = carry
            shift = jnp.int32(jnp.abs(acc) * 1e-20)
            s, ks, vs = split_sweep(q * (1.0 + acc * 1e-20), step + shift,
                                    ks, vs)
            return acc + s, ks, vs
        acc, _, _ = jax.lax.fori_loop(0, inner, body,
                                      (jnp.float32(0.0), ks, vs))
        return acc

    results = {"metric": "cache_layout_probe", "fill": fill,
               "layers": layers, "inner": inner,
               "cache_gb_per_sweep": round(
                   layers * 2 * bk * h * g * d * 2 / 1e9, 3),
               "dispatch_ms": round(disp * 1e3, 2)}

    for name, jfn, args in [
        ("merged", jax.jit(amortize_merged), (q0, step0, merged)),
        ("split", jax.jit(amortize_split), (q0, step0, split_k, split_v)),
    ]:
        try:
            s = max(timed(jfn, *args) - disp, 1e-6)
            per = s / inner
            results[name + "_ms"] = round(per * 1e3, 3)
            log(f"[probe] {name} {per*1e3:.2f} ms/sweep")
        except Exception as e:
            log(f"[probe] {name} FAILED: {type(e).__name__}: {e}")
            results[name + "_ms"] = None

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
