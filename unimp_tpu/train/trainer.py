"""Sharded, jitted training step.

The reference's hot loop (/root/reference/UniMP/mmrec.py:65-302) —
label masking, forward, focal loss, backward, allreduce, clip, AdamW —
compiles here into ONE XLA program per batch shape: the answer-span
masking is vectorized on device (vs the reference's Python O(B·T) loop),
images arrive uint8 and are CLIP-normalized on device, gradients are
reduced over the mesh by XLA (vs explicit NCCL), and optimizer state
lives sharded according to the parameter specs (ZeRO-equivalent).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from unimp_tpu.data.masking import answer_span_labels
from unimp_tpu.data.transforms import normalize_on_device
from unimp_tpu.models.flamingo import compute_q_media
from unimp_tpu.parallel.sharding import batch_sharding, param_sharding
from unimp_tpu.train.loss import masked_focal_loss
from unimp_tpu.train.optimizer import embedding_row_mask_update
from unimp_tpu.train.partition import cast_tree, merge_params, partition_params


@struct.dataclass
class TrainState:
    step: jax.Array
    params: dict
    opt_state: optax.OptState


class Trainer:
    """Owns the compiled train step and the sharded state."""

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        *,
        media_id: int,
        answer_id: int,
        endofchunk_id: int,
        pad_id: int,
        gamma: float = 2.0,
        use_reweight: bool = False,
        mask_lm_head: bool = False,
        mesh=None,
        skip_nonfinite_updates: bool = True,
        trainable_mask=None,
        frozen_dtype=None,
        grad_dtype=None,
        accum_steps: int = 1,
        vision_cache=None,
    ):
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        self.ids = dict(
            media=media_id, answer=answer_id, eoc=endofchunk_id, pad=pad_id
        )
        self.gamma = gamma
        self.use_reweight = use_reweight
        self.mask_lm_head = mask_lm_head
        self.skip_nonfinite_updates = skip_nonfinite_updates
        # trainable_mask: bool pytree (True = trainable) or a callable on
        # the abstract param tree returning one. When set, gradients are
        # taken w.r.t. the trainable subtree ONLY — XLA never emits dW for
        # frozen kernels (the vision-tower backward disappears entirely
        # when the tower is frozen, matching the reference's
        # requires_grad_(False), open_flamingo factory / mmrec_prefix.py:631)
        # — and the optimizer state exists only for trainable leaves.
        # frozen_dtype (e.g. jnp.bfloat16): storage dtype for frozen
        # params; lossless when it equals the compute dtype.
        self.trainable_mask = trainable_mask
        self.frozen_dtype = frozen_dtype
        # grad_dtype (e.g. bf16): storage dtype for gradient buffers —
        # each f32 grad tensor is rounded as it is produced, so the full
        # f32 gradient tree never lives in HBM at once (XLA fuses the
        # casts into the producing ops). Memory lever for single-chip
        # big-model training; default keeps f32 parity.
        self.grad_dtype = grad_dtype
        # accum_steps > 1: IN-STEP gradient accumulation — the incoming
        # batch (accum_steps * microbatch rows) is scanned microbatch by
        # microbatch inside ONE jitted step, summing grads into a single
        # buffer, then the optimizer applies once. Equivalent math to
        # optax.MultiSteps (the reference's accelerate accumulation,
        # unimp_task.sh bsz 3 x accum 2) but needs NO second gradient
        # tree: at 3b on a 16 GB chip, MultiSteps' extra acc-grads buffer
        # alone exceeds HBM, while this path costs the same memory as
        # accum_steps=1.
        self.accum_steps = accum_steps
        # vision_cache: device array [n_items, P, Dv] of FROZEN ViT
        # tower features (train/vision_cache.py). When set, batches
        # carry "image_ids" [B, M] instead of "images" and the step
        # gathers rows + runs only the trainable perceiver — the tower
        # forward (~20% of refshape FLOPs) leaves the hot loop. Constant
        # w.r.t. training because the tower is frozen and the transform
        # is deterministic (reference protocol, mmrec.py:475-524,
        # rec_dataset.py:90-107).
        self.vision_cache = vision_cache
        self._step_fn = None

    def _init_images(self, sample_batch):
        """Vision input for param init. Cached-vision batches carry
        "image_ids" only, but the param TREE must still include the
        (frozen) tower — it builds the cache and lives in checkpoints —
        so init synthesizes a single dummy image at the config size."""
        if "images" in sample_batch:
            return jnp.asarray(sample_batch["images"])
        b = int(np.asarray(sample_batch["input_ids"]).shape[0])
        s = self.model.cfg.vision.image_size
        return jnp.zeros((b, 1, s, s, 3), jnp.uint8)

    def resolve_mask(self, abstract_params):
        """Concrete bool pytree (or None) for a given param structure."""
        m = self.trainable_mask
        return m(abstract_params) if callable(m) else m

    def trainable_abstract(self, sample_batch):
        """Abstract TRAINABLE subtree — what the optimizer is built over
        (None leaves where frozen)."""
        abstract = self.abstract_params(sample_batch)
        mask = self.resolve_mask(abstract)
        if mask is None:
            return abstract
        return partition_params(abstract, mask)[0]

    # ---------------- state ----------------

    def init_state(self, rng, sample_batch) -> TrainState:
        """Sharded-from-birth initialization.

        With a mesh, parameters are *born* sharded: `jax.eval_shape`
        derives the tree abstractly (no FLOPs, no memory), the partition
        rules map it to NamedShardings, and a single jitted init writes
        each shard directly to its device. The optimizer state is then
        initialized under jit from the already-placed params so moment
        buffers inherit the parameter shardings (ZeRO-style) — at no
        point does an unsharded param or opt-state tree exist, which is
        what lets a 3B model (params + 2 Adam moments f32 ≈ 36 GB)
        initialize on chips with 16 GB HBM each.
        """
        ids = jnp.asarray(sample_batch["input_ids"])
        images = self._init_images(sample_batch)

        def init_fn(rng, ids, images):
            q_media = compute_q_media(ids, self.ids["media"])
            return self.model.init(
                rng, ids, vision_x=normalize_on_device(images), q_media=q_media
            )["params"]

        abstract = self.abstract_params(sample_batch)
        mask = self.resolve_mask(abstract)
        if self.mesh is None:
            params = init_fn(rng, ids, images)
        else:
            pshard = param_sharding(abstract, self.mesh)
            params = jax.jit(init_fn, out_shardings=pshard)(rng, ids, images)
        if mask is None:
            opt_state = jax.jit(self.optimizer.init)(params)
            return TrainState(step=jnp.int32(0), params=params,
                              opt_state=opt_state)
        trainable, frozen = partition_params(params, mask)
        if self.frozen_dtype is not None:
            frozen = self._apply_frozen_dtype(frozen)
            params = merge_params(trainable, frozen)
        # moments only for the trainable subtree (None leaves elsewhere)
        opt_state = jax.jit(self.optimizer.init)(trainable)
        return TrainState(step=jnp.int32(0), params=params, opt_state=opt_state)

    def _compute_dtype(self):
        cfg = getattr(self.model, "cfg", None)
        return getattr(cfg, "compute_dtype", jnp.bfloat16)

    def _apply_frozen_dtype(self, frozen):
        if self.frozen_dtype in ("int8", jnp.int8):
            # weight-only int8 frozen backbone: never updated, read
            # forward-only — 4x less HBM than f32 (2x vs bf16) and
            # faster weight streaming; grads w.r.t. the trainable
            # subtree flow THROUGH the dequant unchanged. Dequant
            # targets the MODEL's compute dtype (fp32 runs must not
            # truncate through bf16 on the fused decode paths).
            from unimp_tpu.utils.quant import quantize_params_int8

            return quantize_params_int8(frozen, dtype=self._compute_dtype())
        return jax.jit(
            functools.partial(cast_tree, dtype=self.frozen_dtype)
        )(frozen)

    def apply_frozen_storage(self, params):
        """Re-apply the frozen-subtree storage layout (int8/bf16) to a
        PLAIN float param tree — for trees arriving from checkpoint
        restore or torch conversion, which always carry ordinary float
        arrays (save_params dequantizes on write)."""
        mask = self.resolve_mask(params)
        if mask is None or self.frozen_dtype is None:
            return params
        trainable, frozen = partition_params(params, mask)
        return merge_params(trainable, self._apply_frozen_dtype(frozen))

    def abstract_params(self, sample_batch):
        """ShapeDtypeStruct param tree via eval_shape — for building
        optimizer masks / shardings without materializing anything.

        Cached after the first call: the PARAM tree does not depend on
        the batch shapes, and each eval_shape re-traces the whole
        vision+LM graph (seconds of host time at 3B scale — the CLIs
        call this 3x during startup otherwise)."""
        if getattr(self, "_abstract_cache", None) is not None:
            return self._abstract_cache
        ids = jnp.asarray(sample_batch["input_ids"])
        images = self._init_images(sample_batch)

        def init_fn(rng, ids, images):
            q_media = compute_q_media(ids, self.ids["media"])
            return self.model.init(
                rng, ids, vision_x=normalize_on_device(images), q_media=q_media
            )["params"]

        self._abstract_cache = jax.eval_shape(
            init_fn, jax.random.PRNGKey(0), ids, images
        )
        return self._abstract_cache

    # ---------------- step ----------------

    def _loss_fn(self, params, batch, vision_cache=None):
        ids = batch["input_ids"]
        labels = answer_span_labels(
            ids, self.ids["answer"], self.ids["eoc"], self.ids["media"],
            self.ids["pad"],
        )
        q_media = compute_q_media(ids, self.ids["media"])
        if vision_cache is not None and "image_ids" in batch:
            # cached frozen-tower features: gather instead of encode
            tower = jnp.take(vision_cache, batch["image_ids"], axis=0)
            media_kw = dict(tower_x=tower)
        else:
            media_kw = dict(vision_x=normalize_on_device(batch["images"]))
        logits, _ = self.model.apply(
            {"params": params},
            ids,
            q_media=q_media,
            kv_len=batch["seq_len"],
            **media_kw,
        )
        return masked_focal_loss(
            logits, labels, batch["weights"], self.gamma, self.use_reweight
        )

    def _make_step(self):
        def step(state: TrainState, batch, vcache):
            mask = self.resolve_mask(state.params)
            if mask is None:
                t_params, f_params = state.params, None
                merge = lambda t: t  # noqa: E731
            else:
                t_params, f_params = partition_params(state.params, mask)
                merge = lambda t: merge_params(t, f_params)  # noqa: E731
            grad_fn = jax.value_and_grad(
                lambda t, mb: self._loss_fn(merge(t), mb, vcache),
                has_aux=True,
            )
            accum = self.accum_steps
            if accum > 1:
                # lax.scan over microbatches: one resident grad buffer,
                # activations live for one microbatch at a time
                def split(x):
                    return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

                mbs = jax.tree.map(split, batch)
                (loss0, aux0), g0 = grad_fn(
                    t_params, jax.tree.map(lambda x: x[0], mbs)
                )
                if self.grad_dtype is not None:
                    g0 = cast_tree(g0, self.grad_dtype)

                def body(carry, mb):
                    gsum, lsum, auxsum = carry
                    (l, a), g = grad_fn(t_params, mb)
                    if self.grad_dtype is not None:
                        g = cast_tree(g, self.grad_dtype)
                    gsum = jax.tree.map(jnp.add, gsum, g)
                    auxsum = jax.tree.map(jnp.add, auxsum, a)
                    return (gsum, lsum + l, auxsum), None

                rest = jax.tree.map(lambda x: x[1:], mbs)
                (grads, loss, aux), _ = jax.lax.scan(
                    body, (g0, loss0, aux0), rest
                )
                inv = 1.0 / accum
                grads = jax.tree.map(
                    lambda g: (g * inv).astype(g.dtype), grads
                )
                loss = loss * inv
                aux = jax.tree.map(lambda a: a * inv, aux)
            else:
                (loss, aux), grads = grad_fn(t_params, batch)
                if self.grad_dtype is not None:
                    grads = cast_tree(grads, self.grad_dtype)
            if self.mask_lm_head:
                grads = embedding_row_mask_update(
                    grads, t_params, self.ids["answer"]
                )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, t_params
            )
            params = merge(optax.apply_updates(t_params, updates))
            gnorm = optax.global_norm(grads)
            if self.skip_nonfinite_updates:
                # NaN/Inf guard: drop the whole update if the loss or the
                # gradient norm is non-finite (the reference only guards
                # its legacy loop, train_utils.py:153-160).
                ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
                params = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old),
                    params, state.params,
                )
                opt_state = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old)
                    if hasattr(new, "shape") else new,
                    opt_state, state.opt_state,
                )
                metrics_skipped = 1 - ok.astype(jnp.int32)
            else:
                metrics_skipped = jnp.int32(0)
            metrics = {"loss": loss, "grad_norm": gnorm,
                       "skipped_nonfinite": metrics_skipped, **aux}
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                metrics,
            )

        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state: TrainState, batch: dict):
        if self._step_fn is None:
            self._step_fn = self._make_step()
        if not isinstance(batch.get("input_ids"), jax.Array):
            batch = self.device_batch(batch)
        return self._step_fn(state, batch, self.vision_cache)

    def device_batch(self, batch: dict) -> dict:
        """Issue (async) host->device transfers for the step's inputs.

        jax.device_put returns immediately with the copy in flight, so
        feeding train_step through data.loader.prefetch_to_device with
        this as put_fn overlaps the next batch's host->device transfer
        with the current step's compute (double buffering). train_step
        detects an already-transferred batch and skips the re-put.
        """
        keep = ("input_ids", "seq_len", "weights", "images", "image_ids")
        out = {k: np.asarray(batch[k]) for k in keep if k in batch}
        if self.mesh is not None:
            shard = batch_sharding(self.mesh)
            return {k: jax.device_put(v, shard) for k, v in out.items()}
        return {k: jax.device_put(v) for k, v in out.items()}

    # back-compat alias (benchmarks/train_profile.py)
    _device_batch = device_batch
