"""Decode-step bandwidth accounting at flagship (4b) shapes.

Round-2 review: the 4b beam-decode step ran at ~340 GiB/s effective
against a v5e's ~819 GB/s spec sheet, with no attribution of the other
60%. This tool measures each term of the step ON THE CHIP so the gap is
explained with data, not spec sheets:

  read_floor    pure HBM stream: sum-reduce every param leaf — the
                bandwidth THIS chip actually achieves on a pure
                sequential read through one program
  dispatch      empty-program round trip (tunnel RTT + launch)
  step_full     one decode step (all layers + lm head), AMORTIZED:
                `inner` steps run inside one program with a data
                dependency, so the ~30 ms tunnel RTT cannot pollute the
                per-step figure (subtracting one dispatch from a
                single-step wall time under-corrects when device work
                overlaps the link — the round-2 numbers did that and
                overstated attention by ~2x)
  attn_only     the 32 decode_attention calls on the live caches,
                amortized the same way — isolates the self-attn KV term
  xattn_only    the gated cross-attention reads (kv_media latents) the
                old profile never measured
  loop_step     the per-step time inside the real 50-step while_loop
                (ground truth the eval throughput actually sees)

Env: BENCH_VARIANT (default 4b), BENCH_BATCH (16), BENCH_BEAMS (10),
BENCH_MAX_NEW (50), BENCH_PROMPT (media prompt from the synth set).
PROFILE_STAGES: comma/space list from {floor, gemv, loop, attn, xattn,
lm_head, layer, step_full} — empty means all. At 4b on a 16 GB chip the
full set does not fit in one process (params + prompt KV + gen caches +
the loop program's internal buffers); run the cache-heavy stages in
separate invocations. UNIMP_DECODE_IMPL pins the attention impl, so two
`PROFILE_STAGES=attn` runs give a device-bound kernel A/B (amortized
in-program, immune to the ~35 ms tunnel RTT).
Prints one JSON line with every term in ms plus derived GB/s.
"""

import dataclasses
import json
import os
import sys
import tempfile
import time

sys_path_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


INNER = int(os.environ.get("BENCH_INNER", "8"))

_ALL_STAGES = ("floor", "gemv", "loop", "beam", "attn", "xattn",
               "lm_head", "layer", "step_full", "step1", "prefill",
               "vision")
_SEL = [s for s in os.environ.get("PROFILE_STAGES", "")
        .replace(",", " ").split() if s]


def want(stage):
    return not _SEL or stage in _SEL


def timed(fn, *args, reps=10, sync=None):
    """Median wall time of fn(*args); sync materializes the output."""
    import numpy as np

    times = []
    out = fn(*args)
    (sync or (lambda o: np.asarray(jax_leaf(o))))(out)  # compile+warm
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        (sync or (lambda o: np.asarray(jax_leaf(o))))(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def attempt(label, fn):
    """Run a profile section; a tunnel/compile failure costs the term,
    not the run (the remote_compile endpoint drops long compiles)."""
    try:
        return fn()
    except Exception as e:
        log(f"[profile] {label} FAILED: {type(e).__name__}: {e}")
        return None


def jax_leaf(tree):
    import jax

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "shape")]
    return leaves[0]


def tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unimp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.decode import GenerationConfig, Generator
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.tools import synth_data
    from unimp_tpu.utils.inference import cast_params_for_inference

    variant = os.environ.get("BENCH_VARIANT", "4b")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    beams = int(os.environ.get("BENCH_BEAMS", "10"))
    max_new = int(os.environ.get("BENCH_MAX_NEW", "50"))

    with tempfile.TemporaryDirectory() as d:
        synth_data.generate(d, n_items=256, n_users=max(batch * 2, 64),
                            image_size=64)
        tok = synth_data.build_tokenizer(d, n_items=256)
        cfg = get_config(variant)
        cfg = cfg.replace(
            lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 128)
        )
        # layer-scaling mode: shrink the REAL model to L layers so the
        # amortized step compiles through the tunnel (the 32-layer
        # step_full/step1 compiles die on remote_compile broken pipes).
        # Two runs (e.g. L=8, 16) give slope (true per-layer in-situ
        # cost) + intercept (fixed per-step overhead) — the attribution
        # the monolithic step can't deliver.
        nl = os.environ.get("PROFILE_NUM_LAYERS")
        if nl:
            cfg = cfg.replace(
                lm=dataclasses.replace(cfg.lm, num_layers=int(nl))
            )
        model = UniMPModel(cfg)
        ds = TaskDataset(d, "beauty", "rec", "test", tok, n_items=256,
                         history_len=5, image_size=cfg.vision.image_size)
        if len(ds) < batch:  # test split may be thin; replicate users
            reps = (batch + len(ds) - 1) // len(ds)
            ds.records = (ds.records * reps)[:batch]
            ds.tasks = (ds.tasks * reps)[:batch]
        dl = DataLoader(ds, batch_size=batch, pad_id=tok.pad_token_id,
                        shuffle=False, num_workers=2, pad_to_multiple=128,
                        fixed_media=4, drop_last=True)
        probe = next(iter(dl))
        ids = jnp.asarray(probe["input_ids"])
        t = int(ids.shape[1])
        from unimp_tpu.data.transforms import normalize_on_device

        log(f"[profile] init {variant} ...")
        params = jax.jit(
            lambda r: cast_params_for_inference(model.init(
                r, ids,
                vision_x=normalize_on_device(jnp.asarray(probe["images"])),
                q_media=compute_q_media(ids, tok.media_token_id),
            )["params"])
        )(jax.random.PRNGKey(0))
        param_bytes = tree_bytes(params)

        # ---------------- dispatch + read floor ----------------
        @jax.jit
        def empty(x):
            return x + 1

        one = jnp.zeros((), jnp.float32)
        dispatch_s = timed(empty, one, reps=20, sync=lambda o: float(o))
        log(f"[profile] dispatch {dispatch_s*1e3:.2f} ms")

        floor_s = None
        read_floor_gbps = None
        if want("floor"):
            log("[profile] read floor ...")

            @jax.jit
            def sum_all(p):
                # amortized like every other term: INNER full passes over
                # the params inside one program with a data dependency (a
                # single pass at 4b is ~10 ms device work vs ~35 ms RTT)
                def body(i, acc):
                    return acc + sum(
                        jnp.sum((x * (1.0 + acc * 1e-20))
                                .astype(jnp.float32))
                        for x in jax.tree.leaves(p)
                    )

                return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

            floor_s = timed(sum_all, params, reps=6,
                            sync=lambda o: float(o))
            floor_s = max(floor_s - dispatch_s, 1e-6) / INNER
            read_floor_gbps = param_bytes / floor_s / 1e9
            log(f"[profile] read_floor {floor_s*1e3:.2f} ms"
                f" = {read_floor_gbps:.0f} GB/s over"
                f" {param_bytes/1e9:.2f} GB")

        # GEMV weight-stream: [32768, 65536] bf16 (4.3 GB) x [65536, 8]
        # through the MXU — the shape class a decode step actually
        # streams weights through (reduces measure the VPU path, which
        # on this chip runs far below the matmul stream rate). Amortized
        # inside one program: a single-call minus-dispatch estimate went
        # negative under async-pipelining jitter.
        w_bytes = 32768 * 65536 * 2

        def _floor_gemv():
            w = jnp.ones((32768, 65536), jnp.bfloat16)  # 4.29 GB
            x = jnp.ones((65536, 8), jnp.bfloat16)

            @jax.jit
            def gemv_loop(w, x):
                def body(i, acc):
                    o = jax.lax.dot_general(
                        w, x * (1.0 + acc * 1e-20),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return acc + jnp.sum(o)

                return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

            s = timed(gemv_loop, w, x, reps=6, sync=lambda o: float(o))
            del w, x
            return w_bytes / (max(s - dispatch_s, 1e-6) / INNER) / 1e9

        read_floor_gemv_gbps = (attempt("read_floor_gemv", _floor_gemv)
                                if want("gemv") else None)
        if read_floor_gemv_gbps:
            log(f"[profile] read_floor_gemv {read_floor_gemv_gbps:.0f} GB/s")

        gen_cfg = GenerationConfig(
            max_new_tokens=max_new, eos_id=tok.eos_token_id,
            pad_id=tok.eos_token_id, num_beams=beams,
            num_return_sequences=beams,
        )
        gen = Generator(model, gen_cfg, media_id=tok.media_token_id)
        encode_fn = jax.jit(
            lambda p, v: model.apply(
                {"params": p}, normalize_on_device(v),
                method=UniMPModel.encode_vision,
            )
        )
        imgs_dev = jnp.asarray(probe["images"])
        latents = encode_fn(params, imgs_dev)
        vision_encode_s = None
        if want("vision"):
            # vision-encode share of prefill (VERDICT r5 item 10:
            # attribute vision-encode vs LM-prefill vs host at 4b)
            np.asarray(latents)
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(encode_fn(params, imgs_dev))
                times.append(time.perf_counter() - t0)
            vision_encode_s = float(np.median(times))
            log(f"[profile] vision encode {vision_encode_s*1e3:.2f} ms "
                f"({int(imgs_dev.shape[0] * imgs_dev.shape[1])} images)")

        # ------------- real loop per-step (ground truth) -------------
        # FIRST, before the standalone decode state exists: the whole-
        # generate program is the number eval throughput actually sees,
        # it is the likeliest compile-cache hit (the 4b eval bench
        # compiles the identical program), and its internal prefill +
        # gen caches need the HBM the standalone state would otherwise
        # hold (running it later OOMs a 16 GB chip at 4b).
        def _loop():
            log("[profile] full beam loop ...")
            toks, _ = gen.generate(params, ids,
                                   jnp.asarray(probe["seq_len"]), latents)
            np.asarray(toks)
            t0 = time.perf_counter()
            toks, _ = gen.generate(params, ids,
                                   jnp.asarray(probe["seq_len"]), latents)
            np.asarray(toks)
            return time.perf_counter() - t0

        loop_s = attempt("loop", _loop) if want("loop") else None
        loop_step_s = loop_s / max_new if loop_s else None
        if loop_step_s:
            log(f"[profile] loop_step {loop_step_s*1e3:.2f} ms")

        # ---- beam-selection math alone (the non-model part of a step):
        # log_softmax over [B, K, V] + top-2K over K*V + the
        # retire/alive top-Ks and gathers, at the real shapes
        beam_s = None
        if want("beam"):
            v = int(cfg.lm.vocab_size)
            kbm = beams

            @jax.jit
            def beam_math(logits, alive_scores, alive_tok, fin_scores,
                          fin_tok):
                def body(i, carry):
                    acc, alive_scores = carry
                    lg = logits * (1.0 + acc * 1e-20)
                    logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
                    cand = (alive_scores[:, :, None] + logp).reshape(
                        batch, kbm * v)
                    top_vals, top_idx = jax.lax.top_k(cand, 2 * kbm)
                    src = top_idx // v
                    tok = (top_idx % v).astype(jnp.int32)
                    is_eos = tok == 2
                    cand_fin = jnp.where(is_eos, top_vals, NEG)
                    all_sc = jnp.concatenate([fin_scores, cand_fin], 1)
                    all_seq = jnp.concatenate(
                        [fin_tok,
                         jnp.take_along_axis(
                             alive_tok, src[:, :, None], axis=1)], 1)
                    keep_vals, keep_idx = jax.lax.top_k(all_sc, kbm)
                    new_fin_tok = jnp.take_along_axis(
                        all_seq, keep_idx[:, :, None], 1)
                    a_vals, a_idx = jax.lax.top_k(
                        jnp.where(is_eos, NEG, top_vals), kbm)
                    a_src = jnp.take_along_axis(src, a_idx, 1)
                    new_alive = jnp.take_along_axis(
                        alive_tok, a_src[:, :, None], 1)
                    acc = (acc + jnp.sum(keep_vals) + jnp.sum(a_vals)
                           + jnp.sum(new_alive) * 1e-20
                           + jnp.sum(new_fin_tok) * 1e-20)
                    return acc, alive_scores
                out, _ = jax.lax.fori_loop(
                    0, INNER, body, (jnp.float32(0.0), alive_scores))
                return out

            NEG = -1e30
            lg0 = jnp.zeros((batch, kbm, v), jnp.float32)
            asc0 = jnp.zeros((batch, kbm), jnp.float32)
            atok0 = jnp.zeros((batch, kbm, max_new), jnp.int32)
            fsc0 = jnp.full((batch, kbm), NEG, jnp.float32)
            ftok0 = jnp.zeros((batch, kbm, max_new), jnp.int32)
            log("[profile] beam_math ...")
            beam_s = attempt("beam_math", lambda: timed(
                beam_math, lg0, asc0, atok0, fsc0, ftok0, reps=6,
                sync=lambda o: float(o)))
            if beam_s is not None:
                beam_s = max(beam_s - dispatch_s, 0.0) / INNER
                log(f"[profile] beam_math {beam_s*1e3:.2f} ms (amortized)")

        # ---------------- live decode state ----------------
        bk = batch * beams
        need_state = any(want(s) for s in
                         ("attn", "xattn", "layer", "step_full", "step1", "prefill"))
        state = caches = anc = tok_in = pos1 = None
        prefill_s = None
        step_idx = jnp.int32(10)  # mid-decode: caches half full
        prompt_kv_bytes = xattn_kv_bytes = gen_kv_bytes = 0
        from unimp_tpu.decode.sampler import left_align

        ids_l, start = left_align(ids, jnp.asarray(probe["seq_len"]),
                                  tok.pad_token_id)
        if need_state:
            log("[profile] prefill ...")
            positions = jnp.maximum(
                jnp.arange(t, dtype=jnp.int32)[None, :] - start[:, None], 0
            )
            q_media = compute_q_media(ids_l, tok.media_token_id)
            n_media = q_media[:, -1]
            kv_media = UniMPModel.kv_media_for(latents)

            @jax.jit
            def prefill(p, ids_l, start, positions, latents, q_media):
                logits, kv = model.apply(
                    {"params": p}, ids_l, latents=latents, q_media=q_media,
                    kv_start=start, positions=positions, return_kv=True,
                    last_logit_only=True,
                )
                return logits[:, -1], kv

            last_logits, kv = prefill(params, ids_l, start, positions,
                                      latents, q_media)
            np.asarray(last_logits)
            # time the prefill program: generate() = prefill + max_new
            # steps, so loop_step must subtract this to attribute the
            # per-step cost (loop_total/max_new overstates it otherwise)
            if want("prefill"):
                times = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    ll, _kv = prefill(params, ids_l, start, positions,
                                      latents, q_media)
                    np.asarray(ll)
                    times.append(time.perf_counter() - t0)
                prefill_s = max(
                    float(np.median(times)) - dispatch_s, 0.0)
                log(f"[profile] prefill {prefill_s*1e3:.1f} ms")
            state = {
                "self": kv["self"], "xattn": kv.get("xattn", []),
                "kv_start": start, "n_media": n_media,
                "kv_media": kv_media,
            }
            del last_logits, kv
            caches = model.init_gen_caches(bk, max_new)
            anc = jnp.tile(
                jnp.arange(bk, dtype=jnp.int32)[:, None], (1, max_new)
            )
            tok_in = jnp.full((bk, 1), 11, jnp.int32)
            start_k = jnp.repeat(start, beams, axis=0)
            pos1 = (t + 10 - start_k)[:, None]

            prompt_kv_bytes = tree_bytes(state["self"])
            xattn_kv_bytes = tree_bytes(state["xattn"])
            gen_kv_bytes = tree_bytes(caches)

        # ---------------- attention-only ----------------
        from unimp_tpu.ops.decode_attention import decode_attention

        heads = cfg.lm.num_heads
        head_dim = cfg.lm.head_dim

        @jax.jit
        def attn_only(q, state_self, caches, anc):
            def sweep(qq):
                outs = []
                for layer_kv, layer_gen in zip(state_self, caches):
                    gk = layer_gen["k"]
                    gv = layer_gen["v"]
                    outs.append(decode_attention(
                        qq, layer_kv["k"], layer_kv["v"], gk, gv,
                        step=step_idx, kv_start=start,
                        beam_sel=anc,
                    ))
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

            def body(i, acc):
                return acc + sweep(q * (1.0 + acc * 1e-20))

            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

        # the attention probes never touch the params: free the 8 GB so
        # the standalone pallas probe (whose cache inputs may need a
        # layout-change copy at the program boundary) fits a 16 GB chip
        if not any(want(s) for s in ("lm_head", "layer", "step_full", "step1")):
            del params
            params = None

        q_in = jnp.zeros((bk, heads, head_dim), cfg.compute_dtype)
        attn_s = None
        if want("attn"):
            impl = os.environ.get("UNIMP_DECODE_IMPL", "auto")
            log(f"[profile] attn_only (impl={impl}) ...")
            attn_s = attempt("attn_only", lambda: timed(
                attn_only, q_in, state["self"], caches, anc,
                reps=6, sync=lambda o: float(o)))
            if attn_s is not None:
                attn_s = max(attn_s - dispatch_s, 0.0) / INNER
                log(f"[profile] attn_only {attn_s*1e3:.2f} ms (amortized)")

        # gated cross-attention term: beam-shared single-query reads over
        # the projected media-latent KV — every xattn layer, every step
        from unimp_tpu.ops.decode_attention import single_query_attention

        n_xattn = len(state["xattn"]) if state else 0

        @jax.jit
        def xattn_only(q, kvm):
            def sweep(qq):
                outs = []
                for c in kvm:
                    # heads-major cache [B, H, S, D]: mask is [B, S]
                    mask = jnp.ones(
                        (c["k"].shape[0], c["k"].shape[2]), bool)
                    outs.append(single_query_attention(
                        qq, c["k"], c["v"], mask))
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

            def body(i, acc):
                return acc + sweep(q * (1.0 + acc * 1e-20))

            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

        xattn_s = None
        if n_xattn and want("xattn"):
            log("[profile] xattn_only ...")
            xattn_s = attempt("xattn_only", lambda: timed(
                xattn_only, q_in, state["xattn"],
                reps=6, sync=lambda o: float(o)))
            if xattn_s is not None:
                xattn_s = max(xattn_s - dispatch_s, 0.0) / INNER
                log(f"[profile] xattn_only {xattn_s*1e3:.2f} ms"
                    f" ({n_xattn} layers, amortized)")

        # lm-head term timed directly (the decode path always computes
        # [BK, V] logits; this isolates that matmul's cost)
        d_model = cfg.lm.hidden_size

        @jax.jit
        def lm_head_only(p, h):
            emb = p["embed"]["embedding"] if cfg.lm.tie_embeddings else (
                p["lm_head"]["kernel"]
            )
            if cfg.lm.tie_embeddings:
                return jax.lax.dot_general(
                    h, emb.astype(h.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return jax.lax.dot_general(
                h, emb.astype(h.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        h_in = (jnp.zeros((bk, d_model), cfg.compute_dtype)
                if want("lm_head") else None)

        @jax.jit
        def lm_head_scalar(p, h):
            # scalar output: a [BK, V] f32 fetch costs ~20 ms over the
            # tunnel and would be misread as device time
            def body(i, acc):
                return acc + jnp.sum(
                    lm_head_only(p, h * (1.0 + acc * 1e-20)))

            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

        lm_head_s = None
        if want("lm_head"):
            log("[profile] lm_head ...")
            lm_head_s = attempt("lm_head", lambda: timed(
                lm_head_scalar, params, h_in, reps=6,
                sync=lambda o: float(o)))
            if lm_head_s is not None:
                lm_head_s = max(lm_head_s - dispatch_s, 0.0) / INNER
                log(f"[profile] lm_head {lm_head_s*1e3:.2f} ms (amortized)")

        # ---------------- one-layer step probe ----------------
        # One decoder block's decode step (self-attn on live caches +
        # MLP), a small fast compile; x num_layers estimates the
        # backbone term without the monolithic step program.
        blk_params = (params[f"block_{cfg.lm.num_layers // 2}"]
                      if want("layer") else None)

        def _layer_probe():
            from unimp_tpu.models.lm import DecoderBlock

            block = DecoderBlock(cfg.lm, dtype=cfg.compute_dtype)
            mid = cfg.lm.num_layers // 2
            layer_ds = {
                "prompt": state["self"][mid],
                "gen": caches[mid],
                "step": step_idx,
                "kv_start": start,
                "gen_index": anc,
            }

            @jax.jit
            def layer_step(bp, x):
                def body(i, carry):
                    acc, gen = carry
                    y, gc = block.apply(
                        {"params": bp}, x * (1.0 + acc * 1e-20),
                        positions=pos1,
                        decode_state=dict(layer_ds, gen=gen),
                    )
                    return acc + jnp.sum(y.astype(jnp.float32)), gc

                return jax.lax.fori_loop(
                    0, INNER, body, (jnp.float32(0.0), layer_ds["gen"])
                )

            x_in = jnp.zeros((bk, 1, d_model), cfg.compute_dtype)
            s = timed(layer_step, blk_params, x_in, reps=6,
                      sync=lambda o: float(o[0]))
            return max(s - dispatch_s, 0.0) / INNER

        layer_s = attempt("layer_step", _layer_probe) if want("layer") \
            else None
        if layer_s is not None:
            log(f"[profile] layer_step {layer_s*1e3:.2f} ms"
                f" (x{cfg.lm.num_layers} = "
                f"{layer_s*cfg.lm.num_layers*1e3:.1f} ms)")

        # ---------------- monolithic step (LAST: may drop the tunnel) --
        def run_step(p, tokens, caches, anc, pos):
            def body(i, carry):
                acc, gen = carry
                # int token dependency on the carry without changing it
                tok = tokens + (acc.astype(jnp.int32) & 0)
                ds = dict(state, gen=gen, step=step_idx, gen_index=anc)
                logits, gen = model.apply(
                    {"params": p}, tok, positions=pos, decode_state=ds
                )
                return acc + jnp.sum(logits.astype(jnp.float32)), gen

            return jax.lax.fori_loop(
                0, INNER, body, (jnp.float32(0.0), caches)
            )

        # single-call model step: no fori amortization — at ~30 ms of
        # device work the ~±2 ms dispatch noise is tolerable, and the
        # much smaller program survives the tunnel's compile timeout
        # (the amortized step_full died twice at ~25 min of compile)
        step1_s = None
        if want("step1"):
            def one_step(p, tokens, caches, anc, pos):
                ds = dict(state, gen=caches, step=step_idx, gen_index=anc)
                logits, gen = model.apply(
                    {"params": p}, tokens, positions=pos, decode_state=ds
                )
                return jnp.sum(logits.astype(jnp.float32))

            step1 = jax.jit(one_step)
            log("[profile] step1 (single-call model step) ...")
            step1_s = attempt("step1", lambda: timed(
                step1, params, tok_in, caches, anc, pos1, reps=12,
                sync=lambda o: float(o)))
            if step1_s is not None:
                step1_s = max(step1_s - dispatch_s, 0.0)
                log(f"[profile] step1 {step1_s*1e3:.2f} ms (single call)")

        step_full_s = None
        if want("step_full"):
            step_full = jax.jit(run_step)
            log("[profile] step_full ...")
            step_full_s = attempt("step_full", lambda: timed(
                step_full, params, tok_in, caches, anc, pos1, reps=6,
                sync=lambda o: float(o[0])))
            if step_full_s is not None:
                step_full_s = max(step_full_s - dispatch_s, 0.0) / INNER
                log(f"[profile] step_full {step_full_s*1e3:.2f} ms"
                    " (amortized)")

    step_bytes = (param_bytes + prompt_kv_bytes + xattn_kv_bytes
                  + gen_kv_bytes)

    def ms(x):
        # 0.0 is a real measurement (device work below the clock floor),
        # only None means the section failed
        return round(x * 1e3, 2) if x is not None else None

    out = {
        "metric": f"decode_step_profile_{variant}",
        "unit": "ms",
        "batch": batch, "beams": beams, "prompt_len": t,
        "max_new": max_new,
        "param_gb": round(param_bytes / 1e9, 2),
        "prompt_kv_gb": round(prompt_kv_bytes / 1e9, 2),
        "xattn_kv_gb": round(xattn_kv_bytes / 1e9, 2),
        "gen_kv_gb": round(gen_kv_bytes / 1e9, 2),
        "read_floor_gbps": (round(read_floor_gbps, 1)
                            if read_floor_gbps else None),
        "decode_impl": os.environ.get("UNIMP_DECODE_IMPL", "auto"),
        "read_floor_gemv_gbps": (round(read_floor_gemv_gbps, 1)
                                 if read_floor_gemv_gbps else None),
        "dispatch_ms": round(dispatch_s * 1e3, 2),
        "inner": INNER,
        "step_full_ms": ms(step_full_s),
        "step1_ms": ms(step1_s),
        "lm_head_ms": ms(lm_head_s),
        "attn_only_ms": ms(attn_s),
        "xattn_only_ms": ms(xattn_s),
        "layer_step_ms": ms(layer_s),
        "layers_extrapolated_ms": (
            ms(layer_s * cfg.lm.num_layers) if layer_s is not None else None),
        "beam_math_ms": ms(beam_s),
        "loop_step_ms": ms(loop_step_s),
        "prefill_ms": ms(prefill_s),
        "vision_encode_ms": ms(vision_encode_s),
        "loop_step_net_ms": (
            round((loop_s - prefill_s) / max_new * 1e3, 2)
            if (loop_s and prefill_s is not None) else None),
        "loop_total_s": round(loop_s, 2) if loop_s else None,
        "loop_eff_gbps": (round(step_bytes / loop_step_s / 1e9, 1)
                          if loop_step_s else None),
        "vs_read_floor": (round(
            (step_bytes / loop_step_s) / (param_bytes / floor_s), 3)
            if loop_step_s and floor_s else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
