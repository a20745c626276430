"""UniMP model: CLIP-ViT -> perceiver resampler -> gated-xattn decoder.

The unified multimodal personalization model, re-designed TPU-first with
the same capabilities as the reference's OpenFlamingo build
(/root/reference/UniMP/mmrec.py:475-524): a frozen-able vision tower, a
perceiver resampler, and a causal LM whose every-Nth block is preceded
by a tanh-gated cross-attention block over the resampled media latents
(gates init 0 so the pretrained LM is unchanged at step 0).

Three entry modes on __call__:
  * full forward (training):       logits, None
  * prefill (return_kv=True):      logits, {"self": [...], "xattn": [...]}
    — per-layer prompt KV [B, T] and per-xattn-layer projected latent KV
  * decode (decode_state=...):     logits, [updated gen caches]
    — one token per beam against the SPLIT cache: shared prompt KV +
    per-beam generated KV (see unimp_tpu/ops/decode_attention.py)

Media masking: each text token cross-attends only to the latents of the
most recent preceding <image> ("immediate", Flamingo semantics); the
per-token media index `q_media` is data (cumsum of media tokens),
computed by `compute_q_media` and passed in so the module stays pure.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.models.config import UniMPConfig
from unimp_tpu.models.layers import Attention, DenseWeights, Mlp, make_norm
from unimp_tpu.ops.quant_matmul import quant_dot
from unimp_tpu.models.lm import DecoderBlock, init_gen_cache
from unimp_tpu.models.perceiver import PerceiverResampler
from unimp_tpu.models.vit import VisionTower
from unimp_tpu.ops import AttnMask


def compute_q_media(input_ids: jax.Array, media_token_id: int) -> jax.Array:
    """Per-token index of the most recent media at/preceding each position.

    The <image> token itself belongs to its media (cumsum inclusive), so
    the tokens describing item i attend to item i's latents.
    """
    return jnp.cumsum(
        (input_ids == media_token_id).astype(jnp.int32), axis=1
    )


def media_allowed(kv_media, n_media, mode: str):
    """[B, S] decode-time latent mask: generated tokens attend the last
    media ("immediate") or all media ("all_previous")."""
    if mode == "immediate":
        return kv_media == n_media[:, None]
    if mode == "all_previous":
        return (kv_media <= n_media[:, None]) & (kv_media > 0)
    raise ValueError(mode)


class GatedCrossAttnBlock(nn.Module):
    """tanh-gated cross-attention + gated FF (Flamingo)."""

    num_heads: int
    head_dim: int
    ff_mult: int = 4
    media_mode: str = "immediate"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x,
        latents_flat=None,
        q_media=None,
        kv_media=None,
        *,
        return_cache: bool = False,
        xattn_cache: Optional[dict] = None,
        allowed: Optional[jax.Array] = None,
        attn_impl: Optional[str] = None,
    ):
        d = x.shape[-1]
        attn_gate = self.param("attn_gate", nn.initializers.zeros, (), jnp.float32)
        ff_gate = self.param("ff_gate", nn.initializers.zeros, (), jnp.float32)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_attn")(x)
        attn = Attention(
            num_heads=self.num_heads, head_dim=self.head_dim, use_bias=False,
            dtype=self.dtype, name="xattn",
        )
        if xattn_cache is not None:
            attn_out, cache = attn(h, xattn_cache=xattn_cache,
                                   xattn_allowed=allowed, attn_impl=attn_impl)
        else:
            mask = AttnMask(
                q_media=q_media, kv_media=kv_media, media_mode=self.media_mode
            )
            attn_out, cache = attn(
                h, latents_flat, mask=mask, return_cache=return_cache
            )
        x = x + jnp.tanh(attn_gate).astype(self.dtype) * attn_out
        h = nn.LayerNorm(dtype=self.dtype, name="ln_ff")(x)
        ff_out = Mlp(
            hidden=self.ff_mult * d, act="gelu", use_bias=False,
            dtype=self.dtype, name="mlp",
        )(h)
        return x + jnp.tanh(ff_gate).astype(self.dtype) * ff_out, cache


class UniMPModel(nn.Module):
    cfg: UniMPConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.vision = VisionTower(cfg.vision, dtype=dt)
        self.resampler = PerceiverResampler(cfg.resampler, dtype=dt)
        self.embed = nn.Embed(
            cfg.lm.vocab_size, cfg.lm.hidden_size, dtype=dt,
            param_dtype=jnp.float32, name="embed",
        )
        blocks, xattns = [], []
        for i in range(cfg.lm.num_layers):
            if i % cfg.cross_attn_every_n == 0:
                xattns.append(
                    GatedCrossAttnBlock(
                        num_heads=cfg.lm.num_heads, head_dim=cfg.lm.head_dim,
                        media_mode=cfg.media_mode, dtype=dt,
                        name=f"xattn_{i}",
                    )
                )
            else:
                xattns.append(None)
            blocks.append(DecoderBlock(cfg.lm, dtype=dt, name=f"block_{i}"))
        self.blocks = blocks
        self.xattns = xattns
        self.final_ln = make_norm(
            cfg.lm.norm, cfg.lm.layernorm_eps, dt, "final_ln"
        )
        if not cfg.lm.tie_embeddings:
            # nn.Dense-identical param tree; the matmul routes through
            # quant_dot so int8 runs stream int8 bytes per decode step
            self.lm_head = DenseWeights(
                cfg.lm.vocab_size, use_bias=False, name="lm_head",
            )

    def encode_vision(self, vision_x: jax.Array) -> jax.Array:
        """[B, M, H, W, 3] CLIP-normalized -> latents [B, M, L, Dv]."""
        b, m = vision_x.shape[:2]
        flat = vision_x.reshape((b * m,) + vision_x.shape[2:])
        feats = self.vision(flat)  # [B*M, P, Dv]
        lat = self.resampler(feats)  # [B*M, L, Dv]
        return lat.reshape(b, m, lat.shape[1], lat.shape[2])

    def encode_vision_tower(self, vision_x: jax.Array) -> jax.Array:
        """FROZEN half of encode_vision: [B, M, H, W, 3] -> ViT patch
        features [B, M, P, Dv], STOPPING before the (trainable)
        perceiver. Item images are static and the tower is frozen in
        the reference protocol (open_flamingo factory requires_grad_,
        /root/reference/UniMP/mmrec.py:475-524), so these features are
        constant across epochs — train/vision_cache.py precomputes them
        per item and the train step gathers instead of re-encoding."""
        b, m = vision_x.shape[:2]
        flat = vision_x.reshape((b * m,) + vision_x.shape[2:])
        feats = self.vision(flat)  # [B*M, P, Dv]
        return feats.reshape(b, m, feats.shape[1], feats.shape[2])

    def resample_tower(self, tower_feats: jax.Array) -> jax.Array:
        """TRAINABLE half: tower features [B, M, P, Dv] -> resampled
        media latents [B, M, L, Dv]. encode_vision == resample_tower
        (encode_vision_tower (x))."""
        b, m = tower_feats.shape[:2]
        flat = tower_feats.reshape((b * m,) + tower_feats.shape[2:])
        lat = self.resampler(flat)
        return lat.reshape(b, m, lat.shape[1], lat.shape[2])

    def _logits(self, x):
        x = self.final_ln(x)
        # MXU-friendly: bf16 operands with f32 accumulation (the pure-f32
        # matmul runs at 1/8 MXU rate and the extra mantissa doesn't
        # change beam ranking in practice).
        if self.cfg.lm.tie_embeddings:
            emb = self.embed.embedding.astype(x.dtype)
            return jax.lax.dot_general(
                x, emb,
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        kernel, _ = self.lm_head.weights(x.shape[-1])
        return quant_dot(x, kernel)

    @staticmethod
    def kv_media_for(latents) -> jax.Array:
        b, m, l, _ = latents.shape
        return jnp.broadcast_to(
            jnp.repeat(jnp.arange(1, m + 1, dtype=jnp.int32), l)[None, :],
            (b, m * l),
        )

    def __call__(
        self,
        input_ids: jax.Array,
        *,
        latents: Optional[jax.Array] = None,
        vision_x: Optional[jax.Array] = None,
        tower_x: Optional[jax.Array] = None,
        q_media: Optional[jax.Array] = None,
        kv_len: Optional[jax.Array] = None,
        kv_start: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        return_kv: bool = False,
        last_logit_only: bool = False,
        return_hidden: bool = False,
        decode_state: Optional[dict] = None,
    ):
        """Full forward, prefill, or single-token decode (see module doc).

        decode_state: {"self": [...], "xattn": [...], "gen": [...],
        "step", "kv_start", "n_media", "kv_media"}.
        """
        cfg = self.cfg

        # ---------- decode: one token per beam ----------
        if decode_state is not None:
            x = self.embed(input_ids)
            allowed = None
            if decode_state.get("kv_media") is not None:
                allowed = media_allowed(
                    decode_state["kv_media"], decode_state["n_media"],
                    cfg.media_mode,
                )
            new_gen = []
            xi = 0
            for i, (block, xattn) in enumerate(zip(self.blocks, self.xattns)):
                if xattn is not None:
                    if allowed is not None:
                        x, _ = xattn(
                            x, xattn_cache=decode_state["xattn"][xi],
                            allowed=allowed,
                            attn_impl=decode_state.get("attn_impl"),
                        )
                    xi += 1
                layer_ds = {
                    "prompt": decode_state["self"][i],
                    "gen": decode_state["gen"][i],
                    "step": decode_state["step"],
                    "kv_start": decode_state.get("kv_start"),
                    "gen_index": decode_state.get("gen_index"),
                    "attn_impl": decode_state.get("attn_impl"),
                }
                x, gc = block(
                    x, positions=positions, decode_state=layer_ds,
                )
                new_gen.append(gc)
            return self._logits(x), new_gen

        # ---------- full / prefill ----------
        if latents is None and vision_x is not None:
            latents = self.encode_vision(vision_x)
        elif latents is None and tower_x is not None:
            # cached-vision training: frozen ViT features arrive
            # precomputed (train/vision_cache.py); only the trainable
            # perceiver runs in-step
            latents = self.resample_tower(tower_x)

        latents_flat = kv_media = None
        if latents is not None:
            b, m, l, dv = latents.shape
            latents_flat = latents.reshape(b, m * l, dv)
            kv_media = self.kv_media_for(latents)
            if q_media is None:
                raise ValueError("q_media required when media is present")

        x = self.embed(input_ids)
        causal = input_ids.shape[1] > 1
        # cfg.remat: checkpoint each block in the training path —
        # jax.checkpoint recomputes activations in backward, trading
        # FLOPs for HBM on big models. (Prefill/return_kv is inference:
        # no backward, so no remat needed.)
        use_remat = cfg.remat and not return_kv

        def run_block(mdl, h, kvl, kvs, pos):
            return mdl(
                h, kv_len=kvl, kv_start=kvs, positions=pos,
                causal=causal, return_cache=False,
            )[0]

        def run_xattn(mdl, h, lat, qm, km):
            return mdl(h, lat, qm, km, return_cache=False)[0]

        if use_remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if cfg.remat_policy == "dots" else None
            )
            run_block = nn.remat(run_block, policy=policy)
            run_xattn = nn.remat(run_xattn, policy=policy)

        self_caches, xattn_caches = [], []
        for i, (block, xattn) in enumerate(zip(self.blocks, self.xattns)):
            if xattn is not None and latents_flat is not None:
                if use_remat:
                    x = run_xattn(xattn, x, latents_flat, q_media, kv_media)
                    xc = None
                else:
                    x, xc = xattn(
                        x, latents_flat, q_media, kv_media,
                        return_cache=return_kv,
                    )
                if return_kv:
                    xattn_caches.append(xc)
            if use_remat:
                x, sc = run_block(block, x, kv_len, kv_start, positions), None
            else:
                x, sc = block(
                    x, kv_len=kv_len, kv_start=kv_start, positions=positions,
                    causal=causal, return_cache=return_kv,
                )
            self_caches.append(sc)
        if return_hidden:
            # contextual token embeddings (final-norm hidden states, no
            # lm-head) — the text tower doubles as the hermetic
            # BERTScore encoder (evals/bertscore.py)
            return self.final_ln(x), None
        if last_logit_only:
            # prefill for generation: only the last position's logits are
            # consumed — skip the [T, V] lm-head matmul for the rest.
            x = x[:, -1:]
        logits = self._logits(x)
        if return_kv:
            return logits, {"self": self_caches, "xattn": xattn_caches}
        return logits, None

    def init_gen_caches(self, batch: int, max_new: int,
                        quantized: bool = False):
        return [
            init_gen_cache(batch, max_new, self.cfg.lm,
                           self.cfg.compute_dtype, quantized=quantized)
            for _ in range(self.cfg.lm.num_layers)
        ]
