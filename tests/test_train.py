"""Train-step tests: smoke on 8-device mesh, loss decreases (overfit),
freezing, and weight-decay grouping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.data.dataset import TaskDataset
from unimp_tpu.data.loader import DataLoader
from unimp_tpu.models import UniMPModel, get_config
from unimp_tpu.parallel import make_mesh
from unimp_tpu.tools import synth_data
from unimp_tpu.train.optimizer import decay_mask, make_optimizer, make_schedule
from unimp_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # e2e/training/subprocess: excluded from the quick lane


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import dataclasses

    d = str(tmp_path_factory.mktemp("synth"))
    synth_data.generate(d, n_items=32, n_users=16, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=32)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 64))
    model = UniMPModel(cfg)
    ds = TaskDataset(d, "beauty", "rec", "train", tok,
                     n_items=32, history_len=5, image_size=28)
    dl = DataLoader(ds, batch_size=8, pad_id=tok.pad_token_id,
                    num_workers=0, pad_to_multiple=32, seed=0)
    return tok, model, dl


def test_train_step_runs_and_loss_decreases(setup):
    tok, model, dl = setup
    batch = next(iter(dl))

    mesh = make_mesh(dp=None, fsdp=1, tp=1)  # all 8 cpu devices as dp
    trainer = Trainer(
        model,
        optimizer=None,  # set below
        media_id=tok.media_token_id,
        answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id,
        pad_id=tok.pad_token_id,
        gamma=2.0,
        use_reweight=True,
        mesh=mesh,
    )
    # initialize params first to build the optimizer mask
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(batch["input_ids"])
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models.flamingo import compute_q_media

    params = model.init(
        rng, ids, vision_x=normalize_on_device(jnp.asarray(batch["images"])),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]
    trainer.optimizer = make_optimizer(
        params, learning_rate=5e-3, lr_scheduler="constant",
        total_steps=100, warmup_steps=0,
    )
    state = trainer.init_state(rng, batch)

    losses = []
    for i in range(8):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one batch must cut the loss substantially
    assert losses[-1] < losses[0] * 0.7, losses


def test_decay_mask_targets_xattn_only(setup):
    tok, model, dl = setup
    batch = next(iter(dl))
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(batch["input_ids"])
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models.flamingo import compute_q_media

    params = model.init(
        rng, ids, vision_x=normalize_on_device(jnp.asarray(batch["images"])),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]
    mask = decay_mask(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(mask)
    decayed = [
        "/".join(p.key for p in kp) for kp, v in flat if v
    ]
    assert decayed, "some xattn kernels must receive weight decay"
    assert all("xattn" in p for p in decayed)
    assert not any("gate" in p for p in decayed)
    # embeddings and norms excluded (reference: apply_decay, mmrec.py:612-619)
    assert not any("embedding" in p for p in decayed)


def test_schedules():
    import numpy as np

    s = make_schedule("cosine", 1.0, 100, 10)
    assert abs(float(s(0))) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert float(s(99)) < 0.01
    s2 = make_schedule("constant", 0.5, 100, 4)
    assert float(s2(50)) == 0.5
    s3 = make_schedule("linear", 1.0, 100, 0)
    assert float(s3(50)) < float(s3(10))


def test_fsdp_tp_mesh_step(setup):
    """Train step compiles and runs with fsdp=2, tp=2 shardings."""
    tok, model, dl = setup
    batch = next(iter(dl))
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        mesh=mesh,
    )
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(batch["input_ids"])
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models.flamingo import compute_q_media

    params = model.init(
        rng, ids, vision_x=normalize_on_device(jnp.asarray(batch["images"])),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]
    trainer.optimizer = make_optimizer(params, learning_rate=1e-3)
    state = trainer.init_state(rng, batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def _flat_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        "/".join(p.key if hasattr(p, "key") else str(p) for p in kp): v
        for kp, v in flat
    }


def test_transfer_step_trains_embeddings_freezes_backbone(setup):
    """Transfer (mmrec_prefix) semantics: after one train step the
    embedding table rows for tokens in the batch change (new-domain
    tokens are learnable) while the frozen resampler / gated-xattn
    params do not move. Reference: mmrec_prefix.py:631-654 (freeze then
    resize -> resized embedding trainable)."""
    from unimp_tpu.cli.mmrec_prefix import frozen_mask

    tok, model, dl = setup
    batch = next(iter(dl))
    mesh = make_mesh(dp=None, fsdp=1, tp=1)
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        mesh=mesh, trainable_mask=frozen_mask,
    )
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(batch), learning_rate=1e-2
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # no Adam moments exist for frozen leaves (None in the opt tree)
    opt_leaf_count = len(jax.tree.leaves(state.opt_state))
    full_leaf_count = len(jax.tree.leaves(state.params))
    assert opt_leaf_count < 2 * full_leaf_count
    before = _flat_paths(jax.device_get(state.params))
    state, metrics = trainer.train_step(state, batch)
    after = _flat_paths(jax.device_get(state.params))
    assert np.isfinite(float(metrics["loss"]))

    emb_key = next(p for p in before if p.endswith("embed/embedding"))
    used = np.unique(np.asarray(batch["input_ids"]))
    emb_delta = np.abs(after[emb_key] - before[emb_key]).max(axis=1)
    assert emb_delta[used].max() > 0, "embedding rows must be trainable"

    frozen_paths = [p for p in before
                    if p.startswith("resampler") or "xattn_" in p]
    assert frozen_paths
    for p in frozen_paths:
        np.testing.assert_array_equal(before[p], after[p])
    # and at least one backbone LM kernel moved
    lm_keys = [p for p in before if "block_" in p and "xattn" not in p
               and p.endswith("kernel")]
    assert any(np.abs(after[p] - before[p]).max() > 0 for p in lm_keys)


def test_backbone_freeze_reference_trainability(setup):
    """Main-path trainability (open_flamingo factory + resize,
    mmrec.py:595): perceiver + gated xattn + embeddings train; the
    vision tower and LM backbone blocks stay frozen, get no Adam
    moments, and (frozen_dtype) can be stored in bf16."""
    from unimp_tpu.train.partition import backbone_trainable_mask

    tok, model, dl = setup
    batch = next(iter(dl))
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        trainable_mask=backbone_trainable_mask, frozen_dtype="bfloat16",
    )
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(batch), learning_rate=1e-2
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    before = _flat_paths(jax.device_get(state.params))
    # gates are zero-init (Flamingo), so resampler/xattn-projection grads
    # are zero at step 1 — run a few steps so gradient reaches them
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
    after = _flat_paths(jax.device_get(state.params))
    assert np.isfinite(float(metrics["loss"]))

    for p, v in after.items():
        top = p.split("/", 1)[0]
        frozen = top.startswith(("vision", "block_", "final_ln"))
        if frozen:
            np.testing.assert_array_equal(before[p], v)
            assert v.dtype == jnp.bfloat16, p  # frozen storage dtype
        else:
            assert v.dtype == np.float32, p  # trainable master weights
    moved = [p for p, v in after.items()
             if np.abs(np.asarray(v, np.float32)
                       - np.asarray(before[p], np.float32)).max() > 0]
    assert any(p.startswith("resampler") for p in moved)
    assert any("xattn_" in p for p in moved)
    assert any(p.startswith("embed") for p in moved)

    # the compiled backward must not touch vision-tower weight gradients:
    # trainable-subtree grad leaves exclude every vision/block path
    t_abs = trainer.trainable_abstract(batch)
    from jax.tree_util import tree_flatten_with_path

    flat, _ = tree_flatten_with_path(t_abs)
    paths = ["/".join(pp.key for pp in kp) for kp, _ in flat]
    assert paths and not any(p.startswith(("vision", "block_")) for p in paths)


def test_frozen_int8_train_step_and_float_checkpoint(setup, tmp_path):
    """--frozen_int8: frozen kernels become QuantizedKernel leaves (int8
    storage), trainable subtree still updates, frozen stays untouched,
    and checkpoints save as ordinary float trees."""
    from unimp_tpu.train import checkpoint as ckpt
    from unimp_tpu.train.partition import backbone_trainable_mask
    from unimp_tpu.utils.quant import QuantizedKernel, count_quantized

    tok, model, dl = setup
    batch = next(iter(dl))
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        trainable_mask=backbone_trainable_mask, frozen_dtype="int8",
    )
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(batch), learning_rate=1e-2
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    n_q = count_quantized(state.params)
    assert n_q > 5, n_q

    def find_quantized(tree, prefix=()):
        if isinstance(tree, QuantizedKernel):
            return prefix, tree
        if isinstance(tree, dict):
            for k, v in tree.items():
                hit = find_quantized(v, prefix + (k,))
                if hit is not None:
                    return hit
        return None

    qpath, qk0 = find_quantized(state.params)
    q_before = np.asarray(qk0.q)
    emb_before = np.asarray(state.params["embed"]["embedding"])
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    _, qk = find_quantized(state.params)
    assert isinstance(qk, QuantizedKernel)
    np.testing.assert_array_equal(q_before, np.asarray(qk.q))
    assert np.abs(np.asarray(state.params["embed"]["embedding"])
                  - emb_before).max() > 0  # trainable moved

    # checkpoint saves a float tree; eval reload restores it
    ckpt.save_params(str(tmp_path), state.params, "w")
    restored = ckpt.restore_params(str(tmp_path), "w")
    r_kernel = restored
    for k in qpath:
        r_kernel = r_kernel[k]
    assert not isinstance(r_kernel, QuantizedKernel)
    assert np.asarray(r_kernel).dtype == np.float32
    deq = np.asarray(qk.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(r_kernel), deq, rtol=1e-6)

    # ---- resume roundtrip: checkpoints are float trees, the restore
    # targets the dequantized layout, and apply_frozen_storage re-applies
    # the int8 frozen layout (the --resume_from_checkpoint path)
    from unimp_tpu.utils.quant import abstract_dequantized

    ckpt.save_train_state(str(tmp_path), state, epoch=0)
    like = {"params": abstract_dequantized(state.params),
            "opt_state": state.opt_state, "step": state.step, "epoch": 0}
    payload = ckpt.restore_params(str(tmp_path), "checkpoint_0", like=like)
    assert int(payload["epoch"]) == 0
    resumed = trainer.apply_frozen_storage(payload["params"])
    _, qk_r = find_quantized(resumed)
    assert isinstance(qk_r, QuantizedKernel)
    # requantizing the dequantized weights is idempotent (same grid)
    np.testing.assert_array_equal(np.asarray(qk.q), np.asarray(qk_r.q))
    np.testing.assert_allclose(
        np.asarray(resumed["embed"]["embedding"]),
        np.asarray(state.params["embed"]["embedding"]), rtol=1e-6)


def test_quantized_param_sharding_specs():
    """param_specs on an int8-quantized tree: q keeps the kernel's
    partition rule, the per-channel scale is replicated."""
    from jax.sharding import PartitionSpec as P

    from unimp_tpu.parallel.sharding import param_specs
    from unimp_tpu.utils.quant import quantize_params_int8

    tree = {"block_0": {"mlp": {"up": {"kernel": jnp.ones((256, 512))}}}}
    qtree = quantize_params_int8(tree, min_size=1)
    specs = param_specs(qtree)
    qk_specs = specs["block_0"]["mlp"]["up"]["kernel"]
    float_specs = param_specs(tree)["block_0"]["mlp"]["up"]["kernel"]
    assert qk_specs.q == float_specs  # same rule as the float kernel
    assert qk_specs.scale == P()


def test_sharded_from_birth_init(setup):
    """init_state must never materialize an unsharded param/opt tree:
    optimizer.init is only ever invoked abstractly (tracers), and the
    born params/moments carry the partition-rule shardings."""
    import optax

    from unimp_tpu.parallel.sharding import param_sharding

    tok, model, dl = setup
    batch = next(iter(dl))
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        mesh=mesh,
    )
    abstract = trainer.abstract_params(batch)
    base = make_optimizer(abstract, learning_rate=1e-3)
    concrete_init_calls = []

    def spy_init(p):
        concrete_init_calls.append(
            not any(isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(p))
        )
        return base.init(p)

    trainer.optimizer = optax.GradientTransformation(spy_init, base.update)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    assert concrete_init_calls, "optimizer.init must run (under jit)"
    assert not any(concrete_init_calls), \
        "optimizer.init saw concrete (unsharded) params — eager init leak"

    expected = param_sharding(abstract, mesh)
    got = jax.tree.map(lambda x: x.sharding, state.params)
    flat_exp, flat_got = _flat_paths(expected), _flat_paths(got)
    assert flat_exp == flat_got
    # Adam moments inherit the parameter shardings (ZeRO-style)
    for s in jax.tree.leaves(state.opt_state,
                             is_leaf=lambda x: hasattr(x, "sharding")):
        assert hasattr(s, "sharding")


@pytest.mark.parametrize("remat_policy", ["none", "dots"])
def test_remat_variant_trains(setup, remat_policy):
    """cfg.remat wraps blocks in jax.checkpoint; grads still flow and
    match the no-remat baseline bitwise-close (remat is numerically
    neutral — it only changes WHAT is recomputed in backward).
    remat_policy="dots" saves matmul outputs
    (dots_with_no_batch_dims_saveable)."""
    import dataclasses

    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.models.flamingo import compute_q_media
    from unimp_tpu.models import UniMPModel, get_config
    from unimp_tpu.train.loss import masked_focal_loss
    from unimp_tpu.data.masking import answer_span_labels

    tok, _, dl = setup
    batch = next(iter(dl))
    cfg = get_config("debug", dtype="float32", remat=True,
                     remat_policy=remat_policy)
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 64))
    model = UniMPModel(cfg)
    ids = jnp.asarray(batch["input_ids"])
    vision = normalize_on_device(jnp.asarray(batch["images"]))
    q_media = compute_q_media(ids, tok.media_token_id)
    params = model.init(jax.random.PRNGKey(0), ids, vision_x=vision,
                        q_media=q_media)["params"]

    def loss_fn(p):
        logits, _ = model.apply({"params": p}, ids, vision_x=vision,
                                q_media=q_media)
        labels = answer_span_labels(
            ids, tok.answer_token_id, tok.endofchunk_token_id,
            tok.media_token_id, tok.pad_token_id)
        return masked_focal_loss(logits, labels,
                                 jnp.asarray(batch["weights"]))[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0


def test_adam_cast_matches_optax_in_f32():
    """_scale_by_adam_cast with f32 storage must reproduce
    optax.scale_by_adam exactly; bf16 storage stays close (the
    single-chip 3B memory configuration)."""
    import optax

    from unimp_tpu.train.optimizer import _scale_by_adam_cast

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
    ref = optax.scale_by_adam()
    ours = _scale_by_adam_cast(0.9, 0.999, 1e-8, None, None)
    s_ref, s_ours = ref.init(params), ours.init(params)
    ours16 = _scale_by_adam_cast(0.9, 0.999, 1e-8, jnp.bfloat16, jnp.bfloat16)
    s16 = ours16.init(params)
    assert s16.mu["w"].dtype == jnp.bfloat16
    assert s16.nu["w"].dtype == jnp.bfloat16
    for i in range(5):
        g = {"w": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
             "b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
        u_ref, s_ref = ref.update(g, s_ref)
        u_ours, s_ours = ours.update(g, s_ours)
        u16, s16 = ours16.update(g, s16)
        for k in g:
            np.testing.assert_allclose(u_ours[k], u_ref[k], rtol=1e-6,
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(u16[k], np.float32),
                                       u_ref[k], rtol=0.1, atol=0.05)


def test_bf16_state_train_step(setup):
    """End-to-end step with frozen backbone + bf16 grads/moments."""
    from unimp_tpu.train.partition import backbone_trainable_mask

    tok, model, dl = setup
    batch = next(iter(dl))
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        trainable_mask=backbone_trainable_mask, frozen_dtype="bfloat16",
        grad_dtype="bfloat16",
    )
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(batch), learning_rate=5e-3,
        mu_dtype="bfloat16", nu_dtype="bfloat16",
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(6):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_in_step_grad_accumulation_matches_multisteps(setup):
    """Trainer(accum_steps=2) over a [2*mb] batch must produce the same
    parameters as optax.MultiSteps fed the two microbatches separately —
    same math (mean of per-microbatch grads), but with a single resident
    gradient buffer (the memory shape that fits 3b on one chip)."""
    import optax

    tok, model, dl = setup
    batch = next(iter(dl))  # 8 rows -> 2 microbatches of 4

    def mk_trainer(accum):
        return Trainer(
            model, optimizer=None, media_id=tok.media_token_id,
            answer_id=tok.answer_token_id,
            endofchunk_id=tok.endofchunk_token_id,
            pad_id=tok.pad_token_id, use_reweight=True,
            skip_nonfinite_updates=False, accum_steps=accum,
        )

    rng = jax.random.PRNGKey(1)

    tr_a = mk_trainer(2)
    tr_a.optimizer = make_optimizer(
        tr_a.abstract_params(batch), learning_rate=1e-2,
        lr_scheduler="constant", total_steps=10, warmup_steps=0,
    )
    state_a = tr_a.init_state(rng, batch)
    state_a, m_a = tr_a.train_step(state_a, batch)

    tr_b = mk_trainer(1)
    tr_b.optimizer = optax.MultiSteps(
        make_optimizer(
            tr_b.abstract_params(batch), learning_rate=1e-2,
            lr_scheduler="constant", total_steps=10, warmup_steps=0,
        ),
        2,
    )
    state_b = tr_b.init_state(rng, batch)
    for i in range(2):
        mb = {k: np.asarray(v)[i * 4:(i + 1) * 4] for k, v in batch.items()}
        state_b, m_b = tr_b.train_step(state_b, mb)

    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_fused_accum_with_int8_frozen_backbone(setup):
    """The reference-shape bench configuration: in-step scan
    accumulation over a frozen int8 backbone (QuantizedKernel leaves
    closed over by the scanned grad fn) — trainable subtree moves,
    frozen int8 payload bit-identical, loss finite."""
    from unimp_tpu.train.partition import backbone_trainable_mask
    from unimp_tpu.utils.quant import count_quantized

    tok, model, dl = setup
    batch = next(iter(dl))  # 8 rows -> 2 microbatches of 4
    trainer = Trainer(
        model, optimizer=None,
        media_id=tok.media_token_id, answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        trainable_mask=backbone_trainable_mask, frozen_dtype="int8",
        accum_steps=2, grad_dtype="bfloat16",
    )
    trainer.optimizer = make_optimizer(
        trainer.trainable_abstract(batch), learning_rate=1e-2
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    assert count_quantized(state.params) > 5
    emb_before = np.asarray(state.params["embed"]["embedding"])
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.abs(np.asarray(state.params["embed"]["embedding"])
                  - emb_before).max() > 0


def test_cached_vision_step_matches_image_step(setup, tmp_path):
    """Frozen-tower latent caching (train/vision_cache.py): a train step
    fed precomputed tower features via image_ids must produce the SAME
    loss and updated trainable params as the step that encodes images
    in-line — the tower is frozen and the transform deterministic, so
    its features are constants of training (VERDICT r4 item 1a;
    reference protocol mmrec.py:475-524, rec_dataset.py:90-107)."""
    import dataclasses

    from unimp_tpu.train.partition import backbone_trainable_mask
    from unimp_tpu.train.vision_cache import build_tower_cache, tower_cache_bytes

    d = str(tmp_path / "synth")
    synth_data.generate(d, n_items=16, n_users=8, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=16)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 64))
    model = UniMPModel(cfg)

    def mk_loader(load_images):
        ds = TaskDataset(d, "beauty", "rec", "train", tok, n_items=16,
                         history_len=5, image_size=28,
                         load_images=load_images)
        return ds, DataLoader(ds, batch_size=4, pad_id=tok.pad_token_id,
                              num_workers=0, pad_to_multiple=32, seed=0)

    ds_img, dl_img = mk_loader(True)
    ds_ids, dl_ids = mk_loader(False)
    batch_img = next(iter(dl_img))
    batch_ids = next(iter(dl_ids))
    np.testing.assert_array_equal(batch_img["input_ids"],
                                  batch_ids["input_ids"])

    def mk_trainer(vision_cache):
        t = Trainer(
            model, optimizer=None, media_id=tok.media_token_id,
            answer_id=tok.answer_token_id,
            endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
            use_reweight=True, trainable_mask=backbone_trainable_mask,
            vision_cache=vision_cache,
        )
        return t

    t_img = mk_trainer(None)
    abstract = t_img.trainable_abstract(batch_img)
    t_img.optimizer = make_optimizer(abstract, learning_rate=1e-2,
                                     lr_scheduler="constant",
                                     total_steps=10, warmup_steps=0)
    state = t_img.init_state(jax.random.PRNGKey(0), batch_img)

    cache = build_tower_cache(model, state.params, ds_ids.item_image, 16,
                              chunk=8)
    assert tower_cache_bytes(16, cfg) >= cache.nbytes  # f32 accounting
    t_ids = mk_trainer(cache)
    t_ids.optimizer = t_img.optimizer

    # train_step donates the state: give each trainer its own copy
    state2 = jax.tree.map(
        lambda x: jnp.copy(x) if hasattr(x, "shape") else x, state
    )
    s_img, m_img = t_img.train_step(state, batch_img)
    s_ids, m_ids = t_ids.train_step(state2, batch_ids)
    np.testing.assert_allclose(float(m_img["loss"]), float(m_ids["loss"]),
                               rtol=1e-6)
    mask = t_img.resolve_mask(s_img.params)
    flat_img = jax.tree_util.tree_flatten_with_path(s_img.params)[0]
    flat_ids = dict(
        ("/".join(str(k) for k in kp), v)
        for kp, v in jax.tree_util.tree_flatten_with_path(s_ids.params)[0]
    )
    for kp, v in flat_img:
        key = "/".join(str(k) for k in kp)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ids[key]), rtol=2e-5, atol=2e-6,
            err_msg=key,
        )


def test_prefetch_to_device_matches_plain_path(setup):
    """Device-side double buffering (data/loader.py prefetch_to_device +
    Trainer.device_batch) yields batches in order, already transferred,
    and train_step produces the same loss as the host-batch path."""
    from unimp_tpu.data.loader import prefetch_to_device

    tok, model, dl = setup
    trainer = Trainer(
        model, optimizer=None, media_id=tok.media_token_id,
        answer_id=tok.answer_token_id,
        endofchunk_id=tok.endofchunk_token_id, pad_id=tok.pad_token_id,
        use_reweight=True,
    )
    batch = next(iter(dl))
    t_abs = trainer.abstract_params(batch)
    trainer.optimizer = make_optimizer(
        t_abs, learning_rate=1e-3, lr_scheduler="constant",
        total_steps=10, warmup_steps=0)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state2 = jax.tree.map(
        lambda x: jnp.copy(x) if hasattr(x, "shape") else x, state
    )

    # ordering: the wrapper must preserve the loader's batch order
    seen = list(prefetch_to_device(iter([{"input_ids": np.full((1,), i)}
                                         for i in range(5)]),
                                   trainer.device_batch))
    assert [int(b["input_ids"][0]) for b in seen] == list(range(5))
    assert all(isinstance(b["input_ids"], jax.Array) for b in seen)

    # same materialized batch through both paths (TaskDataset prompt
    # sampling advances an RNG, so two loader passes differ by design)
    it = prefetch_to_device(iter([batch]), trainer.device_batch)
    pre = next(it)
    assert isinstance(pre["input_ids"], jax.Array)  # already on device
    assert "tasks" not in pre  # host-only keys filtered by device_batch
    _, m_pre = trainer.train_step(state, pre)
    _, m_host = trainer.train_step(state2, batch)
    np.testing.assert_allclose(float(m_pre["loss"]), float(m_host["loss"]),
                               rtol=1e-6)
