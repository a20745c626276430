"""Compose the decode layer's weight matmuls WITH live attention.

Round-4 bisect: each decode-step term probes at/near its floor in
isolation (weights 812 GB/s, attention ~8.5 ms/32L, KV writes aliased),
yet the real loop's net step is ~1.5× the sum of parts — and removing
the dynamic chunk walk (full-width reads) bought only +2% end-to-end.
Remaining explanations: (a) composing the terms in one program is
inherently slower (VMEM pressure / scheduling), or (b) the outer beam
while_loop wrapper adds the cost. This probe measures (a): per
pseudo-layer it runs the REAL per-layer work — qkv projection on the
BK=160 activations, real `decode_attention` on live-layout caches
(full-width static reads), output projection, the parallel-block MLP —
across LAYERS weight+cache replicas, amortized INNER times in one
program. Compare against the parts:

  combo        qkv -> decode_attention -> o_proj + MLP (the real block)
  weights_only same matmuls, attention replaced by identity
  attn_only    decode_attention alone (gen_ancestry_probe cross-check)

combo ≈ weights_only + attn_only  -> composition is free; the gap is
                                      the while_loop wrapper (b)
combo ≈ the real loop's step      -> composition itself is the cost (a)

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

    b, kb, h, d, t, g = 16, 10, 32, 80, 128, 50
    dm = h * d  # 2560
    bk = b * kb
    fill = int(os.environ.get("PROBE_FILL", "25"))
    layers = int(os.environ.get("PROBE_LAYERS", "8"))
    inner = int(os.environ.get("PROBE_INNER", "12"))
    reps = int(os.environ.get("PROBE_REPS", "7"))

    rng = np.random.default_rng(0)

    def mk(*shape, dtype=jnp.bfloat16, scale=0.02):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * scale, dtype)

    weights = [{
        "qkv": mk(dm, 3 * dm),
        "o": mk(dm, dm),
        "in": mk(dm, 4 * dm),
        "out": mk(4 * dm, dm),
    } for _ in range(layers)]
    pks = [mk(b, h, t, d, scale=1.0) for _ in range(layers)]
    pvs = [mk(b, h, t, d, scale=1.0) for _ in range(layers)]
    gks = [mk(bk, h, g, d, scale=1.0) for _ in range(layers)]
    gvs = [mk(bk, h, g, d, scale=1.0) for _ in range(layers)]
    sel = jnp.asarray(rng.integers(0, kb, (bk, g)), jnp.int32)
    x0 = mk(bk, dm, scale=1.0)
    weight_bytes = layers * (3 * dm * dm + dm * dm + 8 * dm * dm) * 2

    def amortize(sweep):
        def run(x, step, *args):
            def body(i, acc):
                shift = jnp.int32(jnp.abs(acc) * 1e-20)  # 0 at runtime
                return acc + sweep(x * (1.0 + acc * 1e-20), step + shift,
                                   *args)
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))
        return run

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

    disp = timed(lambda x: dispatch(x), jnp.zeros((), jnp.float32))
    log(f"[probe] dispatch {disp*1e3:.2f} ms")

    def layer(x, step, w, pk, pv, gk, gv, with_attn, with_weights):
        if with_weights:
            qkv = jnp.dot(x, w["qkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :dm].astype(x.dtype)
        else:
            q = x
        if with_attn:
            o = decode_attention(
                q.reshape(bk, h, d), pk, pv, gk, gv, step=step,
                beam_sel=sel, gen_chunk=0, impl="xla",
            ).reshape(bk, dm)
        else:
            o = q
        if with_weights:
            a = jnp.dot(o, w["o"], preferred_element_type=jnp.float32)
            hmid = jax.nn.gelu(
                jnp.dot(x, w["in"], preferred_element_type=jnp.float32)
                .astype(x.dtype))
            mlp = jnp.dot(hmid, w["out"],
                          preferred_element_type=jnp.float32)
            return x + a.astype(x.dtype) + mlp.astype(x.dtype)
        return x + o

    def make(with_attn, with_weights):
        def sweep(x, step, weights, pks, pvs, gks, gvs):
            for w, pk, pv, gk, gv in zip(weights, pks, pvs, gks, gvs):
                x = layer(x, step, w, pk, pv, gk, gv, with_attn,
                          with_weights)
            return jnp.sum(x.astype(jnp.float32))
        return sweep

    results = {"metric": "combo_step_probe", "fill": fill,
               "layers": layers, "inner": inner,
               "weight_gb_per_sweep": round(weight_bytes / 1e9, 3),
               "dispatch_ms": round(disp * 1e3, 2)}

    step0 = jnp.int32(fill)
    for name, wa, ww in [("combo", True, True),
                         ("weights_only", False, True),
                         ("attn_only", True, False)]:
        try:
            jfn = jax.jit(amortize(make(wa, ww)))
            s = max(timed(jfn, x0, step0, weights, pks, pvs, gks, gvs)
                    - disp, 1e-6)
            per = s / inner
            results[name + "_ms"] = round(per * 1e3, 3)
            log(f"[probe] {name} {per*1e3:.2f} ms/sweep")
        except Exception as e:
            log(f"[probe] {name} FAILED: {type(e).__name__}: {e}")
            results[name + "_ms"] = None

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
