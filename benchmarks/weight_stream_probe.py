"""Measure the decode-step WEIGHT-STREAM efficiency at 4b shapes.

Hypothesis (round-4): the per-step weight stream (~7.9 GB bf16 across
32 decoder layers + 16 xattn blocks) runs well below the ~712 GB/s
measured read floor when driven through M=160-row matmuls, which would
account for the ~8 ms of the 34.6 ms decode step that attention
(measured ~8.5 ms by gen_ancestry_probe) + beam math + xattn + lm_head
do not explain — and would also explain why int8 weights only bought
+6% (the VPU dequant between DMA and MXU halves effective bytes/s).

The probe chains the EXACT per-layer matmul set of the RedPajama-3B
decode step (parallel block: qkv [2560,7680], attn out [2560,2560],
mlp in [2560,10240], mlp out [10240,2560]) across LAYERS distinct
weight replicas, with M = B*K = 160 activation rows, amortized INNER
times per program with an activation perturbation. Candidates:

  bf16_f32acc   bf16 weights, f32 accumulation (the live config)
  bf16_bf16acc  bf16 accumulation (is f32 acc halving MXU rate?)
  bf16_m1280    8x the rows — does more row reuse lift GB/s?
  int8_fused    int8 weights + per-col scales, XLA-fused dequant
                (utils/quant.py apply path)
  stream        elementwise touch of the same weight bytes (floor)

Prints one JSON line with ms/sweep and effective weight GB/s each.

Env: PROBE_M (160), PROBE_LAYERS (8), PROBE_INNER (16), PROBE_REPS (7).
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

    m = int(os.environ.get("PROBE_M", "160"))
    layers = int(os.environ.get("PROBE_LAYERS", "8"))
    inner = int(os.environ.get("PROBE_INNER", "16"))
    reps = int(os.environ.get("PROBE_REPS", "7"))
    d = 2560
    shapes = [(d, 3 * d), (d, d), (d, 4 * d), (4 * d, d)]

    rng = np.random.default_rng(0)

    def mk(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * 0.02, dtype
        )

    wsets = [[mk(*s) for s in shapes] for _ in range(layers)]
    bytes_per_sweep = layers * sum(a * b for a, b in shapes) * 2

    x0 = mk(m, d)
    x_big = mk(8 * m, d)

    def amortize(sweep):
        def run(x, *args):
            def body(i, acc):
                return acc + sweep(x * (1.0 + acc * 1e-20), *args)
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

    results = {"metric": "weight_stream_probe", "m": m, "layers": layers,
               "inner": inner, "d": d,
               "weight_gb_per_sweep": round(bytes_per_sweep / 1e9, 3),
               "dispatch_ms": round(disp * 1e3, 2)}

    def record(name, s, nbytes=bytes_per_sweep):
        per = s / inner
        results[name + "_ms"] = round(per * 1e3, 3)
        results[name + "_gbps"] = round(nbytes / per / 1e9, 1)
        log(f"[probe] {name} {per*1e3:.2f} ms/sweep = "
            f"{results[name + '_gbps']} GB/s of weights")

    def chain(acc_dtype):
        def sweep(x, wsets):
            total = 0.0
            for ws in wsets:
                w_qkv, w_o, w_in, w_out = ws
                # parallel block: attn and mlp branches off the same x
                qkv = jnp.dot(x, w_qkv, preferred_element_type=acc_dtype)
                attn_in = qkv[:, :d].astype(x.dtype)
                a = jnp.dot(attn_in, w_o, preferred_element_type=acc_dtype)
                h = jnp.dot(x, w_in, preferred_element_type=acc_dtype)
                h = jax.nn.gelu(h.astype(x.dtype))
                mlp = jnp.dot(h, w_out, preferred_element_type=acc_dtype)
                x = x + a.astype(x.dtype) + mlp.astype(x.dtype)
            return jnp.sum(x.astype(jnp.float32))
        return sweep

    cands = [
        ("bf16_f32acc", chain(jnp.float32), x0, wsets),
        ("bf16_bf16acc", chain(jnp.bfloat16), x0, wsets),
        ("bf16_m1280", chain(jnp.float32), x_big, wsets),
    ]

    # int8 weights with XLA-fused dequant — mirror the live quantized
    # matmul (utils/quant.py: int8 kernel + f32 per-column scale)
    w8sets, s8sets = [], []
    for ws in wsets:
        w8s, s8s = [], []
        for w in ws:
            wf = np.asarray(w, np.float32)
            scale = np.maximum(np.abs(wf).max(0), 1e-8) / 127.0
            w8s.append(jnp.asarray(
                np.clip(np.round(wf / scale), -127, 127), jnp.int8))
            s8s.append(jnp.asarray(scale, jnp.float32))
        w8sets.append(w8s)
        s8sets.append(s8s)

    def int8_sweep(x, w8sets, s8sets):
        total = 0.0
        for w8s, s8s in zip(w8sets, s8sets):
            def qdot(a, w8, sc):
                y = jnp.dot(a, w8.astype(a.dtype),
                            preferred_element_type=jnp.float32)
                return y * sc
            qkv = qdot(x, w8s[0], s8s[0])
            a = qdot(qkv[:, :d].astype(x.dtype), w8s[1], s8s[1])
            h = jax.nn.gelu(qdot(x, w8s[2], s8s[2]).astype(x.dtype))
            mlp = qdot(h, w8s[3], s8s[3])
            x = x + a.astype(x.dtype) + mlp.astype(x.dtype)
        return jnp.sum(x.astype(jnp.float32))

    def stream(x, wsets):
        acc = 0.0
        for ws in wsets:
            for w in ws:
                acc += jnp.sum((w * x[0, 0]).astype(jnp.float32))
        return acc

    cands.append(("int8_fused", int8_sweep, x0, w8sets, s8sets))
    cands.append(("stream", stream, x0, wsets))

    only = {s for s in os.environ.get("PROBE_ONLY", "").replace(
        ",", " ").split() if s}
    for name, fn, x_in, *args in cands:
        if only and name not in only:
            continue
        try:
            jfn = jax.jit(amortize(fn))
            s = max(timed(jfn, x_in, *args) - disp, 1e-6)
            nbytes = bytes_per_sweep // 2 if name == "int8_fused" \
                else bytes_per_sweep
            record(name, s, nbytes)
        except Exception as e:
            log(f"[probe] {name} FAILED: {type(e).__name__}: {e}")
            results[name + "_ms"] = None

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
