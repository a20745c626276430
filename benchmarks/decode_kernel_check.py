"""On-device validation + timing for the fused Pallas decode kernel.

Runs on the real TPU (the CPU test suite covers the same equivalence in
interpret mode — tests/test_decode.py); this script is the compiled-mode
check: numeric agreement with the XLA split-cache path at 4b-shaped
inputs, then per-call latency for both implementations.

Usage: python benchmarks/decode_kernel_check.py  (one TPU job at a time)
Env: CHECK_B/CHECK_K/CHECK_T/CHECK_G/CHECK_H/CHECK_D override shapes;
CHECK_INT8=1 exercises the in-kernel-dequant int8 cache path.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys_path_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)

from unimp_tpu.decode.sampler import quantize_kv_cache
from unimp_tpu.ops.decode_attention import decode_attention
from unimp_tpu.ops.decode_attention_pallas import pallas_decode_attention


def main():
    e = os.environ.get
    b = int(e("CHECK_B", "4"))
    kb = int(e("CHECK_K", "10"))
    t = int(e("CHECK_T", "256"))
    g = int(e("CHECK_G", "64"))
    h = int(e("CHECK_H", "32"))
    d = int(e("CHECK_D", "64"))
    int8 = e("CHECK_INT8", "0") == "1"
    print(f"backend={jax.default_backend()} "
          f"B={b} K={kb} T={t} G={g} H={h} D={d} int8={int8}", flush=True)
    bk = b * kb
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    q = jax.random.normal(ks[0], (bk, h, d), jnp.bfloat16)
    pk = jax.random.normal(ks[1], (b, h, t, d), jnp.bfloat16)
    pv = jax.random.normal(ks[2], (b, h, t, d), jnp.bfloat16)
    gk = jax.random.normal(ks[3], (bk, h, g, d), jnp.bfloat16)
    gv = jax.random.normal(ks[4], (bk, h, g, d), jnp.bfloat16)
    kv_start = jax.random.randint(ks[5], (b,), 0, t // 4)
    sel = jax.random.randint(ks[6], (bk, g), 0, kb)

    scales = {}
    if int8:
        prompt = quantize_kv_cache({"k": pk, "v": pv})
        gen = quantize_kv_cache({"k": gk, "v": gv})
        pk, pv, gk, gv = prompt["k"], prompt["v"], gen["k"], gen["v"]
        scales = dict(
            prompt_k_scale=prompt["k_scale"],
            prompt_v_scale=prompt["v_scale"],
            gen_k_scale=gen["k_scale"], gen_v_scale=gen["v_scale"],
        )

    f_pal = jax.jit(lambda s: pallas_decode_attention(
        q, pk, pv, gk, gv, step=s, kv_start=kv_start, beam_sel=sel,
        interpret=False, **scales))
    f_xla = jax.jit(lambda s: decode_attention(
        q, pk, pv, gk, gv, step=s, kv_start=kv_start, beam_sel=sel,
        impl="xla", **scales))

    import numpy as np
    tol = 0.1 if int8 else 0.05
    for step in (1, g // 2, g):
        s = jnp.int32(step)
        ref = np.asarray(f_xla(s), dtype=np.float32)
        got = np.asarray(f_pal(s), dtype=np.float32)
        err = float(np.max(np.abs(got - ref)))
        print(f"step={step} max_abs_err={err:.5f}", flush=True)
        assert err < tol, err

    # time at several fill levels: the flash-decode kernel's DMA-skip
    # economy only shows at partial fill (average over a decode ~ g/2)
    for step in (1, g // 2, g):
        s = jnp.int32(step)
        for name, f in (("pallas", f_pal), ("xla", f_xla)):
            np.asarray(f(s))  # sync (block_until_ready is async on axon)
            n = 50
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(s)
            np.asarray(o)
            dt = (time.perf_counter() - t0) / n
            kv_bytes = (2 * b * h * t * d
                        + 2 * bk * h * g * d) * pk.dtype.itemsize
            print(f"step={step} {name}: {dt * 1e6:.1f} us/call "
                  f"({kv_bytes / dt / 1e9:.0f} GB/s full-cache-equivalent)",
                  flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
