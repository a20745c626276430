"""KV-cached generation: greedy + beam search, compiled to one XLA loop.

TPU-native replacement for the reference's eval hot loop — HF
``model.generate(num_beams=10, num_return_sequences=10, early_stopping,
max_new_tokens, eos/pad)`` called per test user at batch size 1
(/root/reference/UniMP/pipeline/eval/eval_rec.py:100-110,
xformers_model/llama.py:835-880). Differences by design:

  * the whole decode (prefill + token loop + beam bookkeeping) is a
    single jitted program using ``lax.while_loop`` — no per-token Python
  * prompts are left-aligned into a fixed window so MANY users decode in
    one batch (the reference is locked to batch 1)
  * the KV cache is SPLIT: prompt KV [B, T] is shared by all beams of a
    row (never duplicated, never reordered) and only the generated KV
    [B*K, max_new] is beam-reordered each step (HF ``_reorder_cache``
    moves the full [B*K, T+max_new] cache instead) — see
    unimp_tpu/ops/decode_attention.py
  * beam-search semantics follow HF beam_search: top-2K candidate
    expansion, EOS candidates with rank < K retire to the finished set
    normalized by length^length_penalty, early_stopping=True stops a row
    once K hypotheses are banked, the False heuristic compares the worst
    banked score against the best attainable running score.

Returns generated tokens only (no prompt), padded with pad_id.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int
    eos_id: int
    pad_id: int
    num_beams: int = 1
    num_return_sequences: int = 1
    length_penalty: float = 1.0
    early_stopping: bool = True
    # sampling (num_beams must be 1): temperature 0 = greedy
    temperature: float = 0.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1.0 = disabled
    # int8 KV caches (prompt + latent + generated): decode streams every
    # cache fully each step, so int8 storage halves that HBM term; the
    # dequant (convert + per-head scale) fuses into the attention math
    kv_int8: bool = False
    # Beam length-penalty convention. transformers changed it in the
    # v4.50 vectorized rewrite:
    #   "full":      score / (prompt_len + generated_before_eos)**lp —
    #                classic BeamSearchScorer (BeamHypotheses.add uses the
    #                whole input_ids length), the semantics the reference
    #                ran under transformers>=4.29
    #                (/root/reference/requirements.txt:26)
    #   "generated": score / (generated_incl_eos)**lp — transformers
    #                >=4.50 GenerationMixin._update_finished_beams
    # HR/NDCG parity with the reference requires "full" (the default);
    # "generated" is golden-tested against the REAL installed
    # transformers generate (tests/test_hf_beam_parity.py).
    length_norm: str = "full"


def quantize_kv_cache(cache: dict) -> dict:
    """{"k","v"} [B, H, S, D] -> int8 + per-(head, position) f32 scales.

    Written once at prefill, read every decode step — symmetric absmax
    over the head dim keeps attention logits within ~0.5% while halving
    the dominant per-step HBM stream."""
    out = {}
    for name in ("k", "v"):
        arr = cache[name].astype(jnp.float32)
        amax = jnp.max(jnp.abs(arr), axis=-1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        out[name] = jnp.clip(
            jnp.round(arr / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        out[name + "_scale"] = scale
    return out


def left_align(input_ids, seq_len, pad_id):
    """Right-padded rows -> left-padded (suffix-aligned) rows.

    Returns (ids, start) where start[b] = T - seq_len[b].
    """
    t = input_ids.shape[1]
    start = (t - seq_len).astype(jnp.int32)
    shifted = jax.vmap(lambda row, s: jnp.roll(row, s))(input_ids, start)
    # roll wraps pad tokens to the front; overwrite leading region with pad
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    ids = jnp.where(pos < start[:, None], pad_id, shifted)
    return ids, start


class Generator:
    """Compiled generate() over a UniMPModel (or API-compatible model)."""

    def __init__(self, model, gen_cfg: GenerationConfig, media_id: int,
                 mesh=None):
        self.model = model
        self.cfg = gen_cfg
        self.media_id = media_id
        # With a mesh, every decode-state tensor (prompt/gen KV caches,
        # ancestry, beam bookkeeping) is pinned row-sharded over
        # (dp, fsdp) via sharding constraints so the SPMD partitioner
        # never has to guess a layout for the freshly created gen caches
        # (a wrong guess forces involuntary full rematerialization at
        # every decode step on real multi-chip).
        self.mesh = mesh
        # pl.pallas_call has no SPMD partitioning rule: under a real
        # multi-device mesh the row/tp-sharded caches would force GSPMD
        # to all-gather them around the kernel every step. Pin the XLA
        # impl there (its einsums partition cleanly); the fused Pallas
        # kernels are the single-device fast path. An explicit
        # UNIMP_DECODE_IMPL still overrides inside the ops.
        self.attn_impl = (
            "xla" if (mesh is not None and mesh.size > 1
                      and not os.environ.get("UNIMP_DECODE_IMPL"))
            else None
        )
        if gen_cfg.kv_int8 and not os.environ.get("UNIMP_DECODE_IMPL"):
            # kv_int8 is a MEMORY lever, not a throughput one: even under
            # the fused Pallas kernels on the split cache layout it
            # measured 8.20 vs 14.92 items/s at 4b batch 16
            # (records/eval_4b_kvint8_split_v5e.json, 2026-08-20) — the
            # per-step dequant costs more than the halved bytes save.
            # Pallas (dequant in VMEM) is still the least-bad impl for it
            # on a single device; under XLA the dequantized cache copies
            # materialize each step (slower again). Under a >1-device
            # mesh Pallas has no SPMD rule, so warn.
            if self.attn_impl is None:
                # ... and only on a real TPU backend: elsewhere "pallas"
                # means interpret mode (orders of magnitude slower than
                # the XLA path); CPU/GPU keep XLA, int8 = memory lever.
                if jax.default_backend() == "tpu":
                    self.attn_impl = "pallas"
            else:
                import warnings

                warnings.warn(
                    "kv_int8 with a multi-device mesh runs the XLA decode "
                    "attention, where int8 caches were measured SLOWER "
                    "than bf16 (dequant copies materialize per step); "
                    "kv_int8 acts as a memory lever only here",
                    stacklevel=2,
                )
        self._fn = None

    def _pin(self, a, spec_for_rank):
        """with_sharding_constraint by rank; head ('tp') axes degrade to
        replicated when the dim isn't divisible by the tp extent."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = spec_for_rank.get(a.ndim)
        if spec is None:
            return a
        tp = self.mesh.shape.get("tp", 1)
        fixed = tuple(
            None if ax == "tp" and a.shape[i] % tp != 0 else ax
            for i, ax in enumerate(spec)
        )
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(self.mesh, P(*fixed))
        )

    # Decode-state layout contract (keeps every program/loop boundary
    # reshard-free): batch/beam rows ride the data axes (dp, fsdp) and
    # KV-head axes ride tp — exactly what the tp-sharded k/v projections
    # produce, so the partitioner never falls back to involuntary full
    # rematerialization of the caches.
    _ROWS = ("dp", "fsdp")

    def _rows(self, tree):
        """Prompt-side state: rank keys [B], [B,S], [B,H,S], [B,H,S,D]
        (KV caches are heads-major — see models.lm.init_gen_cache)."""
        if self.mesh is None:
            return tree
        r = self._ROWS
        spec = {1: (r,), 2: (r, None), 3: (r, "tp", None),
                4: (r, "tp", None, None)}
        return jax.tree.map(
            lambda a: self._pin(a, spec) if hasattr(a, "ndim") else a, tree
        )

    def _rows_gen(self, caches):
        """Gen-KV caches (split K/V — see models.lm.init_gen_cache):
        [B*, H, g] scales and [B*, H, g, D] kv — rows on axis 0."""
        if self.mesh is None:
            return caches
        r = self._ROWS
        spec = {3: (r, "tp", None), 4: (r, "tp", None, None)}
        return jax.tree.map(
            lambda a: self._pin(a, spec) if hasattr(a, "ndim") else a, caches
        )

    # -------------------------------------------------- public

    def generate(self, params, input_ids, seq_len, latents=None, rng=None):
        """input_ids [B, T] right-padded; seq_len [B]; latents [B,M,L,D];
        rng required only for sampling (temperature > 0).

        Returns (tokens [B, R, max_new], scores [B, R]).
        """
        if self._fn is None:
            self._fn = jax.jit(self._generate)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._fn(params, input_ids, seq_len, latents, rng)

    # -------------------------------------------------- internals

    def _decode_step(self, params, tokens, state, gen, step, positions,
                     gen_index=None):
        ds = dict(state, gen=gen, step=step, gen_index=gen_index,
                  attn_impl=self.attn_impl)
        return self.model.apply(
            {"params": params}, tokens, positions=positions, decode_state=ds
        )

    def _generate(self, params, input_ids, seq_len, latents, rng):
        cfg = self.cfg
        b, t = input_ids.shape
        k = cfg.num_beams
        max_new = cfg.max_new_tokens

        ids, start = left_align(input_ids, seq_len, cfg.pad_id)
        positions = jnp.maximum(
            jnp.arange(t, dtype=jnp.int32)[None, :] - start[:, None], 0
        )
        q_media = None
        n_media = None
        kv_media = None
        if latents is not None:
            from unimp_tpu.models.flamingo import UniMPModel, compute_q_media

            q_media = compute_q_media(ids, self.media_id)
            n_media = q_media[:, -1]
            kv_media = UniMPModel.kv_media_for(latents)

        logits, kv = self.model.apply(
            {"params": params}, ids, latents=latents, q_media=q_media,
            kv_start=start, positions=positions, return_kv=True,
            last_logit_only=True,
        )
        last_logits = logits[:, -1]  # last prompt token is at T-1 (left-pad)

        self_kv = kv["self"]
        xattn_kv = kv.get("xattn", [])
        if cfg.kv_int8:
            self_kv = [quantize_kv_cache(c) for c in self_kv]
            xattn_kv = [quantize_kv_cache(c) for c in xattn_kv]
        state = self._rows({
            "self": self_kv,
            "xattn": xattn_kv,
            "kv_start": start,
            "n_media": n_media,
            "kv_media": kv_media,
        })
        if k == 1:
            return self._greedy_loop(params, last_logits, state, start, t, rng)
        return self._beam_loop(params, last_logits, state, start, t, seq_len)

    # ---------------- greedy ----------------

    def _sample_from(self, logits, rng):
        """Temperature / top-k / top-p filtered categorical sample."""
        cfg = self.cfg
        scaled = logits / jnp.maximum(cfg.temperature, 1e-6)
        if cfg.top_k > 0:
            kth = jnp.sort(scaled, axis=-1)[:, -cfg.top_k][:, None]
            scaled = jnp.where(scaled < kth, NEG_INF, scaled)
        if cfg.top_p < 1.0:
            sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_desc, axis=-1)
            csum = jnp.cumsum(probs, axis=-1)
            # smallest set with cumulative prob >= top_p (nucleus)
            keep = csum - probs < cfg.top_p
            cutoff = jnp.min(
                jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
            )
            scaled = jnp.where(scaled < cutoff, NEG_INF, scaled)
        return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)

    def _greedy_loop(self, params, last_logits, state, start, t, rng):
        cfg = self.cfg
        b = last_logits.shape[0]
        max_new = cfg.max_new_tokens
        gen0 = self._rows_gen(
            self.model.init_gen_caches(b, max_new, quantized=cfg.kv_int8)
        )
        sampling = cfg.temperature > 0.0

        def cond(carry):
            step, _, _, _, done, _, _ = carry
            return (step < max_new) & ~jnp.all(done)

        def body(carry):
            step, tokens, logits, gen, done, scores, key = carry
            logp = jax.nn.log_softmax(logits, axis=-1)
            if sampling:
                key, sub = jax.random.split(key)
                nxt = self._sample_from(logits.astype(jnp.float32), sub)
            else:
                nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, cfg.pad_id, nxt)
            scores = scores + jnp.where(
                done, 0.0, jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
            )
            tokens = tokens.at[:, step].set(nxt)
            done = done | (nxt == cfg.eos_id)
            pos = (t + step - start)[:, None]
            new_logits, gen = self._decode_step(
                params, nxt[:, None], state, gen, step, pos
            )
            return step + 1, tokens, new_logits[:, 0], gen, done, scores, key

        tokens0 = jnp.full((b, max_new), cfg.pad_id, jnp.int32)
        done0 = jnp.zeros((b,), bool)
        carry = (jnp.int32(0), tokens0, last_logits, gen0, done0,
                 jnp.zeros((b,), jnp.float32), rng)
        _, tokens, _, _, _, scores, _ = jax.lax.while_loop(cond, body, carry)
        return tokens[:, None, :], scores[:, None]

    # ---------------- beam search ----------------

    def _beam_loop(self, params, last_logits, state, start, t, seq_len):
        cfg = self.cfg
        b, v = last_logits.shape
        k = cfg.num_beams
        max_new = cfg.max_new_tokens
        lp = cfg.length_penalty
        if cfg.length_norm not in ("full", "generated"):
            raise ValueError(f"unknown length_norm: {cfg.length_norm!r}")
        norm_gen = cfg.length_norm == "generated"

        start_k = jnp.repeat(start, k, axis=0)  # positions only
        gen0 = self._rows_gen(
            self.model.init_gen_caches(b * k, max_new, quantized=cfg.kv_int8)
        )
        # beam-ancestry table: anc[bk, g] = GLOBAL cache row holding beam
        # bk's KV for generated position g (caches are never reordered)
        anc0 = self._rows(jnp.zeros((b * k, max_new), jnp.int32))

        alive_tok = jnp.full((b, k, max_new), cfg.pad_id, jnp.int32)
        alive_scores = jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.full((b, k - 1), NEG_INF)], axis=1
        ).astype(jnp.float32)
        fin_tok = jnp.full((b, k, max_new), cfg.pad_id, jnp.int32)
        fin_scores = jnp.full((b, k), NEG_INF, jnp.float32)
        fin_count = jnp.zeros((b,), jnp.int32)
        done = jnp.zeros((b,), bool)
        logits0 = jnp.repeat(last_logits, k, axis=0).reshape(b, k, v)

        def cond(carry):
            step = carry[0]
            done = carry[6]
            return (step < max_new) & ~jnp.all(done)

        def body(carry):
            (step, alive_tok, alive_scores, fin_tok, fin_scores,
             fin_count, done, logits, gen, anc) = carry

            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            cand = alive_scores[:, :, None] + logp  # [B, K, V]
            cand_flat = cand.reshape(b, k * v)
            top_vals, top_idx = jax.lax.top_k(cand_flat, 2 * k)
            src_beam = top_idx // v  # [B, 2K]
            tok = (top_idx % v).astype(jnp.int32)
            is_eos = tok == cfg.eos_id
            rank = jnp.arange(2 * k)[None, :]

            # ---- retire EOS candidates with rank < K to the finished set
            # "full": classic HF normalizes by the whole hypothesis length
            # at add() time — prompt_len + tokens generated so far (eos
            # excluded). "generated": >=4.50 normalizes by
            # cur_len + 1 - prompt_len = generated incl. the eos token.
            if norm_gen:
                hyp_len = jnp.full((b, 1), step + 1, jnp.float32)
            else:
                hyp_len = (seq_len + step).astype(jnp.float32)[:, None]
            cand_fin_score = jnp.where(
                is_eos & (rank < k) & ~done[:, None],
                top_vals / hyp_len**lp,
                NEG_INF,
            )
            cand_seq = jnp.take_along_axis(
                alive_tok, src_beam[:, :, None], axis=1
            )  # [B, 2K, max_new]
            all_scores = jnp.concatenate([fin_scores, cand_fin_score], axis=1)
            all_seq = jnp.concatenate([fin_tok, cand_seq], axis=1)
            keep_vals, keep_idx = jax.lax.top_k(all_scores, k)
            new_fin_scores = keep_vals
            new_fin_tok = jnp.take_along_axis(
                all_seq, keep_idx[:, :, None], axis=1
            )
            new_fin_count = jnp.minimum(
                fin_count + jnp.sum(cand_fin_score > NEG_INF / 2, axis=1), k
            )

            # ---- new alive: top K non-EOS candidates
            alive_vals = jnp.where(is_eos, NEG_INF, top_vals)
            a_vals, a_idx = jax.lax.top_k(alive_vals, k)  # over 2K
            a_src = jnp.take_along_axis(src_beam, a_idx, axis=1)  # [B, K]
            a_tok = jnp.take_along_axis(tok, a_idx, axis=1)
            new_alive_tok = jnp.take_along_axis(
                alive_tok, a_src[:, :, None], axis=1
            )
            new_alive_tok = new_alive_tok.at[:, :, step].set(a_tok)
            # freeze rows that were already done
            new_alive_tok = jnp.where(
                done[:, None, None], alive_tok, new_alive_tok
            )
            new_alive_scores = jnp.where(done[:, None], alive_scores, a_vals)
            new_fin_scores = jnp.where(done[:, None], fin_scores, new_fin_scores)
            new_fin_tok = jnp.where(done[:, None, None], fin_tok, new_fin_tok)
            new_fin_count = jnp.where(done, fin_count, new_fin_count)

            # ---- done condition
            if cfg.early_stopping:
                row_done = new_fin_count >= k
            else:
                # HF heuristic: the best attainable running score cannot
                # beat the worst banked one (same length convention as
                # banking: full hyp length vs generated-only).
                heur_len = (
                    jnp.full((b,), step + 1, jnp.float32) if norm_gen
                    else seq_len.astype(jnp.float32) + step + 1
                )
                best_running = jnp.max(new_alive_scores, axis=1) / heur_len**lp
                worst_fin = jnp.min(new_fin_scores, axis=1)
                row_done = (new_fin_count >= k) & (worst_fin >= best_running)
            new_done = done | row_done

            # ---- ancestry update instead of physical cache reorder:
            # new beam j inherits parent a_src[j]'s history rows and will
            # write its own KV into its own slot at column `step`.
            gather_idx = (
                jnp.arange(b)[:, None] * k + a_src
            ).reshape(b * k)
            anc = jnp.take(anc, gather_idx, axis=0)
            anc = anc.at[:, step].set(
                jnp.arange(b * k, dtype=jnp.int32)
            )
            flat_tok = a_tok.reshape(b * k, 1)
            # the token chosen this step occupies absolute position t+step
            pos = (t + step - start_k)[:, None]
            new_logits, gen = self._decode_step(
                params, flat_tok, state, gen, step, pos, gen_index=anc
            )

            return (step + 1, new_alive_tok, new_alive_scores, new_fin_tok,
                    new_fin_scores, new_fin_count, new_done,
                    new_logits.reshape(b, k, v), gen, anc)

        carry = (jnp.int32(0), alive_tok, alive_scores, fin_tok, fin_scores,
                 fin_count, done, logits0, gen0, anc0)
        (step, alive_tok, alive_scores, fin_tok, fin_scores,
         fin_count, done, _, _, _) = jax.lax.while_loop(cond, body, carry)

        # ---- finalize: the running beams of NOT-done rows compete with
        # the banked set purely by normalized score (classic finalize
        # routes them through BeamHypotheses.add, which drops the worst
        # when over capacity; >=4.50 banks the final step's top-K
        # candidates through the same merged top-k). Done rows keep their
        # banked set only (classic: `if beam_hyp.is_done: continue`).
        fin_len = (
            jnp.full((b, 1), max_new, jnp.float32) if norm_gen
            else seq_len.astype(jnp.float32)[:, None] + max_new
        )
        run_norm = alive_scores / fin_len**lp
        run_norm = jnp.where(done[:, None], NEG_INF, run_norm)
        all_scores = jnp.concatenate([fin_scores, run_norm], axis=1)
        all_tok = jnp.concatenate([fin_tok, alive_tok], axis=1)
        r = self.cfg.num_return_sequences
        _, sel_idx = jax.lax.top_k(all_scores, r)
        out_tok = jnp.take_along_axis(all_tok, sel_idx[:, :, None], axis=1)
        out_scores = jnp.take_along_axis(all_scores, sel_idx, axis=1)
        return out_tok, out_scores
