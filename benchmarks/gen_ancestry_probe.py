"""Race beam-ancestry strategies for the decode gen-KV segment at 4b shapes.

Motivation (round-4): `attn_only` at the flagship shape is 15.8 ms (XLA)
/ 27 ms (Pallas v3) against a ~2-4.6 ms HBM floor. FLOP accounting says
the gap is the one-hot ancestry contraction: it computes q against ALL
P=10 beams' gen KV (x10 FLOPs), and with only K=10 query rows the MXU
runs at ~8% row utilization, so the gen segment is MXU-bound, not
HBM-bound. Killing the P-fold means moving data instead of FLOPs. The
candidates, per layer per step (all include their own data movement):

  onehot_full     status quo math, full-width read (no chunk loop)
  onehot_chunked  status quo: chunked valid read + one-hot contraction
  gather_cols     per-column take_along_axis over the beam axis with the
                  composed ancestry table, then contiguous per-beam attn
  reorder_slab    cumulative reorder: ONE [B,K] slab gather per step
                  (each (b,k) copies its parent's contiguous [H,G,D]
                  slab), write it back, then contiguous per-beam attn
                  with NO ancestry math (the cache is kept resolved)
  reorder_prefix  same, but only the first `fill_pad` columns move
                  (static prefix for the probe; a real step would round
                  the dynamic fill up to a chunk)

`reorder_*` changes the sampler contract (the cache is physically
reordered each step, HF-style, but by slab DMA instead of per-column
math); the probe decides whether that rewrite pays before we do it.

Each candidate is amortized INNER times inside one jitted program with a
scalar data dependency (the remote-tunnel dispatch RTT is ~30 ms, larger
than the device work). LAYERS distinct cache replicas cycle so repeated
sweeps can't alias. Prints one JSON line.

Env: PROBE_B (16), PROBE_K (10), PROBE_H (32), PROBE_D (80),
PROBE_T (128), PROBE_G (50), PROBE_FILL (25), PROBE_REPS (5),
PROBE_INNER (8), PROBE_LAYERS (4).
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
    t = int(os.environ.get("PROBE_T", "128"))
    g = int(os.environ.get("PROBE_G", "50"))
    fill = int(os.environ.get("PROBE_FILL", "25"))
    reps = int(os.environ.get("PROBE_REPS", "7"))
    inner = int(os.environ.get("PROBE_INNER", "16"))
    layers = int(os.environ.get("PROBE_LAYERS", "8"))
    chunk = int(os.environ.get("UNIMP_DECODE_GEN_CHUNK", "16"))
    scale = 1.0 / (d ** 0.5)
    fill_pad = min(-(-fill // chunk) * chunk, g)

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32), jnp.bfloat16
        )

    q = mk(b, kb, h, d)
    # heads-major gen caches, one replica set per pseudo-layer
    gks = [mk(b, kb, h, g, d) for _ in range(layers)]
    gvs = [mk(b, kb, h, g, d) for _ in range(layers)]
    pks = [mk(b, h, t, d) for _ in range(layers)]
    pvs = [mk(b, h, t, d) for _ in range(layers)]
    sel = jnp.asarray(rng.integers(0, kb, (b, kb, g)), jnp.int32)
    src = jnp.asarray(rng.integers(0, kb, (b, kb)), jnp.int32)
    step = jnp.int32(fill)

    # ideal bytes per sweep (valid KV only), for GB/s context
    gen_valid_bytes = layers * 2 * b * kb * h * fill * d * 2
    prompt_bytes = layers * 2 * b * h * t * d * 2

    def amortize(sweep):
        """Each iteration perturbs q AND the integer tables with a value
        XLA cannot prove is zero, so per-step work (including the
        gathers/reorders, which would otherwise be loop-invariant and
        hoisted out) really executes `inner` times."""

        def run(q, idx, *args):
            def body(i, acc):
                shift = jnp.int32(jnp.abs(acc) * 1e-20)  # always 0 at runtime
                return acc + sweep(
                    q * (1.0 + acc * 1e-20),
                    jnp.clip(idx + shift, 0, kb - 1),
                    *args,
                )
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

    results = {
        "metric": "gen_ancestry_probe", "b": b, "k": kb, "h": h, "d": d,
        "t": t, "g": g, "fill": fill, "inner": inner, "layers": layers,
        "dispatch_ms": round(disp * 1e3, 2),
    }

    def record(name, s, bytes_per_sweep):
        per = s / inner
        results[name + "_ms"] = round(per * 1e3, 3)
        results[name + "_gbps"] = round(bytes_per_sweep / per / 1e9, 1)
        log(f"[probe] {name} {per*1e3:.2f} ms/sweep "
            f"({results[name + '_gbps']} GB/s of valid KV)")

    # ---------------- contiguous per-beam attention core -------------
    def beam_attn(qq, gk, gv, width):
        """qq [B,K,H,D]; gk/gv [B,K,H,W,D] already ancestry-resolved;
        attends the first `width` (static) columns with pos<step mask."""
        gk = gk[:, :, :, :width]
        gv = gv[:, :, :, :width]
        pos = jnp.arange(width, dtype=jnp.int32)
        mask = pos < step  # [W]
        logits = jnp.einsum(
            "bkhd,bkhcd->bkhc", qq, gk,
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[None, None, None, :], logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = jnp.where(mask[None, None, None, :], p, 0.0)
        o = jnp.einsum(
            "bkhc,bkhcd->bkhd", p.astype(gv.dtype), gv,
            preferred_element_type=jnp.float32)
        return o

    # ---------------- candidates (all take (qq, idx, ...)) -----------
    from unimp_tpu.ops.decode_attention import (
        _chunked_gen_segment,
        decode_attention,
    )

    def onehot_chunked(qq, sel, gks, gvs):
        acc = 0.0
        for gk, gv in zip(gks, gvs):
            o, m, l = _chunked_gen_segment(
                qq, gk, gv, sel, step, scale, None,
                t, jnp.float32(t + fill - 1), chunk)
            acc += jnp.sum(o)
        return acc

    def real_da(qq, sel, pks, pvs, gks, gvs):
        # the live decode_attention at the live cache layouts — run in
        # THIS harness to tie the probe to attn_only's 32-layer number
        acc = 0.0
        qf = qq.reshape(b * kb, h, d)
        self_flat = sel.reshape(b * kb, g)
        for pk, pv, gk, gv in zip(pks, pvs, gks, gvs):
            o = decode_attention(
                qf, pk, pv,
                gk.reshape(b * kb, h, g, d), gv.reshape(b * kb, h, g, d),
                step=step, beam_sel=self_flat, impl="xla")
            acc += jnp.sum(o.astype(jnp.float32))
        return acc

    def onehot_full(qq, sel, gks, gvs):
        acc = 0.0
        onehot = (
            sel[:, :, None, :]
            == jnp.arange(kb, dtype=sel.dtype)[None, None, :, None]
        )  # [B, K, P, G]
        pos = jnp.arange(g, dtype=jnp.int32)
        for gk, gv in zip(gks, gvs):
            logits_all = jnp.einsum(
                "bkhd,bphgd->bkpgh", qq, gk,
                preferred_element_type=jnp.float32) * scale
            logits = jnp.sum(
                jnp.where(onehot[..., None], logits_all, 0.0), axis=2)
            mask = (pos < step)[None, None, :, None]
            logits = jnp.where(mask, logits, NEG_INF)
            m = jnp.max(logits, axis=2, keepdims=True)
            p = jnp.exp(logits - m)
            p = jnp.where(mask, p, 0.0)
            p_sel = p[:, :, None] * onehot[..., None]
            o = jnp.einsum(
                "bkpgh,bphgd->bkhd", p_sel.astype(gv.dtype), gv,
                preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    def gather_cols(qq, sel, gks, gvs):
        # composed table: resolve every column through the beam axis
        idx = sel[:, :, None, :, None]  # [B,K,1,G,1]
        acc = 0.0
        for gk, gv in zip(gks, gvs):
            rk = jnp.take_along_axis(gk, idx, axis=1)  # [B,K,H,G,D]
            rv = jnp.take_along_axis(gv, idx, axis=1)
            acc += jnp.sum(beam_attn(qq, rk, rv, fill_pad))
        return acc

    def reorder_slab(qq, src, gks, gvs):
        # one slab gather per step: new[b,k] = old[b, src[b,k]] (full G)
        idx = src[:, :, None, None, None]
        acc = 0.0
        for gk, gv in zip(gks, gvs):
            rk = jnp.take_along_axis(gk, idx, axis=1)
            rv = jnp.take_along_axis(gv, idx, axis=1)
            # checksum forces the write-back to materialize
            acc += jnp.sum(beam_attn(qq, rk, rv, fill_pad))
            acc += jnp.sum(rk[:, :, :, -1, :1].astype(jnp.float32))
        return acc

    def reorder_prefix(qq, src, gks, gvs):
        # move only the padded valid prefix; tail columns stay in place
        idx = src[:, :, None, None, None]
        acc = 0.0
        for gk, gv in zip(gks, gvs):
            rk = jnp.take_along_axis(gk[:, :, :, :fill_pad], idx, axis=1)
            rv = jnp.take_along_axis(gv[:, :, :, :fill_pad], idx, axis=1)
            acc += jnp.sum(beam_attn(qq, rk, rv, fill_pad))
            acc += jnp.sum(rk[:, :, :, -1, :1].astype(jnp.float32))
        return acc

    # prompt segment, head-major (the live layout), for attribution
    def prompt_only(qq, _idx, pks, pvs):
        acc = 0.0
        for k, v in zip(pks, pvs):
            logits = jnp.einsum(
                "bkhd,bhsd->bkhs", qq, k,
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            o = jnp.einsum("bkhs,bhsd->bkhd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o)
        return acc

    # stream floor: elementwise read of the padded valid gen bytes
    def stream_gen(qq, _idx, gks, gvs):
        acc = 0.0
        for gk, gv in zip(gks, gvs):
            z = gk[:, :, :, :fill_pad] * qq[0, 0, 0, 0]
            acc += jnp.sum(z.astype(jnp.float32))
            acc += jnp.sum(gv[:, :, :, :fill_pad].astype(jnp.float32))
        return acc

    cands = [
        ("real_da", real_da, sel, (pks, pvs, gks, gvs), gen_valid_bytes + prompt_bytes),
        ("onehot_chunked", onehot_chunked, sel, (gks, gvs), gen_valid_bytes),
        ("onehot_full", onehot_full, sel, (gks, gvs), gen_valid_bytes),
        ("gather_cols", gather_cols, sel, (gks, gvs), gen_valid_bytes),
        ("reorder_slab", reorder_slab, src, (gks, gvs), gen_valid_bytes),
        ("reorder_prefix", reorder_prefix, src, (gks, gvs), gen_valid_bytes),
        ("prompt_only", prompt_only, src, (pks, pvs), prompt_bytes),
        ("stream_gen", stream_gen, src, (gks, gvs), gen_valid_bytes),
    ]
    only = {s for s in os.environ.get("PROBE_ONLY", "").replace(
        ",", " ").split() if s}
    for name, fn, idx, args, nbytes in cands:
        if only and name not in only:
            continue
        try:
            jfn = jax.jit(amortize(fn))
            s = max(timed(jfn, q, idx, *args) - disp, 1e-6)
            record(name, s, nbytes)
        except Exception as e:  # keep racing the rest
            log(f"[probe] {name} FAILED: {type(e).__name__}: {e}")
            results[name + "_ms"] = None

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
