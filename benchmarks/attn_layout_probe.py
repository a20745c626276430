"""Decode-attention KV-layout probe at flagship (4b) shapes.

The decode step's dominant term is the attention KV stream
(benchmarks/decode_profile.py: attn ~20.6 ms of a 33.5 ms step at ~190
GB/s effective vs a ~755 GB/s matmul-stream floor). Hypothesis: the
cache layout [B, S, H, D] is the problem — the per-head contraction
reads strided runs of only D=80 elements (160 bytes), far below the
DMA-efficient run length, and D=80 fills 62.5% of the 128-lane vector.

This probe times the SAME prompt-segment and beam-gen-segment math over
candidate layouts, on synthetic tensors of the real 4b decode shapes:

  seq_major    k,v [B, S, H, D]   (status quo; strided per-head reads)
  head_major   k,v [B, H, S, D]   (contiguous [S, D] slab per (b,h))
  head_major_t k,v [B, H, D, S]   (lane dim = S, 128-aligned at T=256)

plus a pure-stream read of the same bytes as the floor. Prints one JSON
line with ms + effective GB/s per candidate.

Each candidate repeats its layer sweep INNER times inside one jitted
program with a scalar data dependency between sweeps (the remote-tunnel
dispatch round trip is ~35 ms — larger than the device work — so
per-call timing measures only the link; amortizing inside the program
is the only honest clock here).

Env: PROBE_B (16), PROBE_K (10), PROBE_H (32), PROBE_D (80),
PROBE_T (256), PROBE_G (64), PROBE_REPS (5), PROBE_INNER (10).
"""

import json
import os
import sys
import time

sys_path_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)

NEG_INF = -1e30


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    b = int(os.environ.get("PROBE_B", "16"))
    kb = int(os.environ.get("PROBE_K", "10"))
    h = int(os.environ.get("PROBE_H", "32"))
    d = int(os.environ.get("PROBE_D", "80"))
    t = int(os.environ.get("PROBE_T", "256"))
    g = int(os.environ.get("PROBE_G", "64"))
    reps = int(os.environ.get("PROBE_REPS", "5"))
    inner = int(os.environ.get("PROBE_INNER", "10"))
    layers = int(os.environ.get("PROBE_LAYERS", "8"))
    scale = 1.0 / (d ** 0.5)

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32), jnp.bfloat16
        )

    q = mk(b, kb, h, d)
    # one tensor per "layer" so repeated calls can't hit a stale cache
    ks = [mk(b, t, h, d) for _ in range(layers)]
    vs = [mk(b, t, h, d) for _ in range(layers)]
    gks = [mk(b, kb, g, h, d) for _ in range(layers)]
    gvs = [mk(b, kb, g, h, d) for _ in range(layers)]
    sel = jnp.asarray(rng.integers(0, kb, (b, kb, g)), jnp.int32)
    step = jnp.int32(g // 2)

    prompt_bytes = layers * 2 * b * t * h * d * 2 * inner
    gen_bytes = layers * 2 * b * kb * g * h * d * 2 * inner

    def amortize(sweep):
        """Repeat `sweep(q)` INNER times with a scalar data dependency so
        one device program holds inner x layers sweeps (defeats CSE: the
        q perturbation changes every iteration)."""

        def run(q, *args):
            def body(i, acc):
                return acc + sweep(q * (1.0 + acc * 1e-20), *args)

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

    # ---------------- stream floor over the same bytes ----------------
    @jax.jit
    def stream(ks, vs):
        def body(i, acc):
            zs = [k * (1.0 + acc * 1e-20) for k in ks]
            return acc + sum(
                jnp.sum(z.astype(jnp.float32)) for z in zs
            ) + sum(jnp.sum(v.astype(jnp.float32)) for v in vs)

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    floor_s = max(timed(stream, ks, vs) - disp, 1e-6)
    floor_gbps = prompt_bytes / floor_s / 1e9
    log(f"[probe] reduce-stream floor {floor_s*1e3:.2f} ms = "
        f"{floor_gbps:.0f} GB/s")

    results = {}

    # ---------------- prompt segment ----------------
    def prompt_seq_major(q, ks, vs):
        acc = 0.0
        for k, v in zip(ks, vs):
            logits = jnp.einsum(
                "bkhd,bshd->bkhs", q, k,
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            o = jnp.einsum("bkhs,bshd->bkhd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    def prompt_head_major(q, ks, vs):
        acc = 0.0
        for k, v in zip(ks, vs):
            logits = jnp.einsum(
                "bkhd,bhsd->bkhs", q, k,
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            o = jnp.einsum("bkhs,bhsd->bkhd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    def prompt_head_major_t(q, ks, vs):
        acc = 0.0
        for k, v in zip(ks, vs):
            logits = jnp.einsum(
                "bkhd,bhds->bkhs", q, k,
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            o = jnp.einsum("bkhs,bhds->bkhd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    cands = [
        ("prompt_seq_major", prompt_seq_major, ks, vs),
        ("prompt_head_major", prompt_head_major,
         [jnp.transpose(k, (0, 2, 1, 3)) for k in ks],
         [jnp.transpose(v, (0, 2, 1, 3)) for v in vs]),
        ("prompt_head_major_t", prompt_head_major_t,
         [jnp.transpose(k, (0, 2, 3, 1)) for k in ks],
         [jnp.transpose(v, (0, 2, 3, 1)) for v in vs]),
    ]
    for name, fn, kk, vv in cands:
        jfn = jax.jit(amortize(fn))
        s = max(timed(jfn, q, kk, vv) - disp, 1e-6)
        results[name + "_ms"] = round(s * 1e3 / inner, 3)
        results[name + "_gbps"] = round(prompt_bytes / s / 1e9, 1)
        log(f"[probe] {name} {s*1e3/inner:.2f} ms/sweep = "
            f"{prompt_bytes/s/1e9:.0f} GB/s")

    # ---------------- beam gen segment (one-hot ancestry) ------------
    def gen_seq_major(q, gks, gvs, sel):
        acc = 0.0
        onehot = (
            sel[:, :, None, :]
            == jnp.arange(kb, dtype=sel.dtype)[None, None, :, None]
        )  # [B, K, P, G]
        for gk, gv in zip(gks, gvs):
            logits_all = jnp.einsum(
                "bkhd,bpghd->bkpgh", q, gk,
                preferred_element_type=jnp.float32) * scale
            logits = jnp.sum(
                jnp.where(onehot[..., None], logits_all, 0.0), axis=2)
            mask = (jnp.arange(g) < step)[None, None, :, None]
            logits = jnp.where(mask, logits, NEG_INF)
            m = jnp.max(logits, axis=2, keepdims=True)
            p = jnp.where(mask, jnp.exp(logits - m), 0.0)
            p_sel = p[:, :, None] * onehot[..., None]
            o = jnp.einsum("bkpgh,bpghd->bkhd", p_sel.astype(gv.dtype), gv,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    def gen_head_major(q, gks, gvs, sel):
        acc = 0.0
        onehot = (
            sel[:, :, None, :]
            == jnp.arange(kb, dtype=sel.dtype)[None, None, :, None]
        )
        for gk, gv in zip(gks, gvs):  # [B, P, H, G, D]
            logits_all = jnp.einsum(
                "bkhd,bphgd->bkpgh", q, gk,
                preferred_element_type=jnp.float32) * scale
            logits = jnp.sum(
                jnp.where(onehot[..., None], logits_all, 0.0), axis=2)
            mask = (jnp.arange(g) < step)[None, None, :, None]
            logits = jnp.where(mask, logits, NEG_INF)
            m = jnp.max(logits, axis=2, keepdims=True)
            p = jnp.where(mask, jnp.exp(logits - m), 0.0)
            p_sel = p[:, :, None] * onehot[..., None]
            o = jnp.einsum("bkpgh,bphgd->bkhd", p_sel.astype(gv.dtype), gv,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    def gen_compacted(q, gks, gvs, sel):
        """Ancestry-free per-beam read: the shape the gen segment takes
        if the cache is kept physically compacted (each beam's row holds
        its own ancestors' tokens). Intermediates are [BK, G, H] f32 —
        tiny — so this measures XLA's raw KV-stream efficiency at M=1.
        `sel` unused; kept for a uniform signature."""
        qf = q.reshape(b * kb, h, d)
        acc = 0.0
        for gk, gv in zip(gks, gvs):  # [BK, G, H, D]
            gkf = gk.reshape(b * kb, g, h, d)
            gvf = gv.reshape(b * kb, g, h, d)
            logits = jnp.einsum(
                "nhd,nghd->ngh", qf, gkf,
                preferred_element_type=jnp.float32) * scale
            mask = (jnp.arange(g) < step)[None, :, None]
            logits = jnp.where(mask, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.where(mask, jnp.exp(logits - m), 0.0)
            o = jnp.einsum("ngh,nghd->nhd", p.astype(gv.dtype), gvf,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    win = 16

    def gen_windowed(q, gks, gvs, sel):
        """Compacted prefix + one-hot over only the last `win` columns —
        the hybrid a periodically-compacted cache actually computes."""
        qf = q.reshape(b * kb, h, d)
        onehot = (
            sel[:, :, None, :win]
            == jnp.arange(kb, dtype=sel.dtype)[None, None, :, None]
        )  # [B, K, P, W]
        acc = 0.0
        for gk, gv in zip(gks, gvs):
            gkf = gk.reshape(b * kb, g, h, d)
            gvf = gv.reshape(b * kb, g, h, d)
            # prefix: plain per-beam
            pre_k = gkf[:, : g - win]
            pre_v = gvf[:, : g - win]
            logits = jnp.einsum(
                "nhd,nghd->ngh", qf, pre_k,
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            o = jnp.einsum("ngh,nghd->nhd", p.astype(gv.dtype), pre_v,
                           preferred_element_type=jnp.float32)
            # window: one-hot ancestry (small intermediates)
            wk = gk[:, :, g - win:]  # [B, P, W, H, D]
            wv = gv[:, :, g - win:]
            logits_w = jnp.einsum(
                "bkhd,bpwhd->bkpwh", q, wk,
                preferred_element_type=jnp.float32) * scale
            lw = jnp.sum(
                jnp.where(onehot[..., None], logits_w, 0.0), axis=2)
            mw = jnp.max(lw, axis=2)  # [B, K, H]
            pw = jnp.exp(lw - mw[:, :, None])
            pw_sel = pw[:, :, None] * onehot[..., None]
            ow = jnp.einsum(
                "bkpwh,bpwhd->bkhd", pw_sel.astype(gv.dtype), wv,
                preferred_element_type=jnp.float32)
            acc += jnp.sum(o) + jnp.sum(ow)
        return acc

    def gen_compact_gather(q, gks, gvs, sel):
        """Cost of the compaction itself: permute the beams of a
        `win`-wide column slab for every layer (what the periodic
        compaction pays once every `win` steps)."""
        acc = 0.0
        perm = sel[:, :, 0]  # [B, K] ancestor rows
        for gk, gv in zip(gks, gvs):
            wk = jnp.take_along_axis(
                gk[:, :, g - win:], perm[:, :, None, None, None], axis=1)
            wv = jnp.take_along_axis(
                gv[:, :, g - win:], perm[:, :, None, None, None], axis=1)
            acc += jnp.sum(wk.astype(jnp.float32)[:, 0, 0, 0, 0]) + jnp.sum(
                wv.astype(jnp.float32)[:, 0, 0, 0, 0])
        return acc

    gcands = [
        ("gen_seq_major", gen_seq_major, gks, gvs),
        ("gen_head_major", gen_head_major,
         [jnp.transpose(x, (0, 1, 3, 2, 4)) for x in gks],
         [jnp.transpose(x, (0, 1, 3, 2, 4)) for x in gvs]),
        ("gen_compacted", gen_compacted, gks, gvs),
        ("gen_windowed", gen_windowed, gks, gvs),
        ("gen_compact_gather", gen_compact_gather, gks, gvs),
    ]
    for name, fn, kk, vv in gcands:
        jfn = jax.jit(amortize(fn))
        s = max(timed(jfn, q, kk, vv, sel) - disp, 1e-6)
        results[name + "_ms"] = round(s * 1e3 / inner, 3)
        results[name + "_gbps"] = round(gen_bytes / s / 1e9, 1)
        log(f"[probe] {name} {s*1e3/inner:.2f} ms/sweep = "
            f"{gen_bytes/s/1e9:.0f} GB/s")

    out = {
        "metric": "decode_attn_layout_probe",
        "shapes": {"b": b, "k": kb, "h": h, "d": d, "t": t, "g": g,
                   "layers": layers},
        "prompt_gb": round(prompt_bytes / 1e9, 3),
        "gen_gb": round(gen_bytes / 1e9, 3),
        "dispatch_ms": round(disp * 1e3, 2),
        "reduce_stream_gbps": round(floor_gbps, 1),
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
