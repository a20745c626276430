"""Eval tests: metric parity vs the reference implementations, text
metrics sanity, and an end-to-end evaluator smoke on the debug model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.evals import metrics as M
from unimp_tpu.evals import text_metrics as T


def _ref_metrics():
    """Literal ports of rec_metrics.py for golden comparison."""

    def mrr_at_k(r, k):
        r = np.asarray(r)[:k].nonzero()[0]
        return 1.0 / (r[0] + 1) if len(r) else 0.0

    def dcg_at_k(r, k):
        r = np.asarray(r, float)[:k]
        if r.size:
            return np.sum(r / np.log2(np.arange(2, r.size + 2)))
        return 0.0

    def ndcg_at_k(r, k, len_gt):
        sent = [1.0] * k if len_gt > k else [1.0] * len_gt + [0.0] * (k - len_gt)
        dcg_max = dcg_at_k(sent, k)
        if not dcg_max:
            return 0.0
        return dcg_at_k(r, k) / dcg_max

    def hit_at_k(r, k):
        return 1.0 if np.sum(np.array(r)[:k]) > 0 else 0.0

    return mrr_at_k, ndcg_at_k, hit_at_k


def test_rank_metrics_match_reference():
    ref_mrr, ref_ndcg, ref_hit = _ref_metrics()
    rng = np.random.default_rng(0)
    for _ in range(50):
        r = (rng.random(10) < 0.25).astype(int)
        for k in (3, 5, 10):
            assert M.mrr_at_k(r, k) == ref_mrr(r, k)
            assert M.hit_at_k(r, k) == ref_hit(r, k)
            for len_gt in (1, 2, 5):
                np.testing.assert_allclose(
                    M.ndcg_at_k(r, k, len_gt), ref_ndcg(r, k, len_gt)
                )


def test_text_metrics_sanity():
    preds = ["the cat sat on the mat", "a quick brown fox"]
    refs = ["the cat sat on the mat", "a quick brown dog"]
    b = T.bleu(preds, refs)
    assert b["precision1"] > 0.8
    assert T.rouge_n(preds, refs, 1) > 0.8
    assert T.rouge_n([preds[0]], [refs[0]], 2) == 1.0
    assert T.rouge_l(preds, refs) > 0.8
    assert T.meteor([preds[0]], [refs[0]]) > 0.9
    assert T.meteor(["xyz"], ["abc"]) == 0.0
    # perfect match scores 1.0 BLEU
    assert T.bleu([preds[0]], [refs[0]])["bleu"] == pytest.approx(1.0)


@pytest.mark.slow
def test_evaluator_end_to_end(tmp_path):
    """Full path: synthetic data -> loaders -> batched beam eval -> metrics."""
    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.evals import evaluate_exp, evaluate_img_sel, evaluate_rec
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.tools import synth_data

    d = str(tmp_path)
    synth_data.generate(d, n_items=24, n_users=12, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=24)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 8))
    model = UniMPModel(cfg)

    ds = TaskDataset(d, "beauty", "rec", "test", tok, n_items=24,
                     history_len=5, image_size=28, max_records=4)
    dl = DataLoader(ds, batch_size=2, pad_id=tok.pad_token_id,
                    shuffle=False, num_workers=0, pad_to_multiple=32,
                    drop_last=False)

    rng = jax.random.PRNGKey(0)
    batch = next(iter(dl))
    ids = jnp.asarray(batch["input_ids"])
    from unimp_tpu.data.transforms import normalize_on_device

    params = model.init(
        rng, ids, vision_x=normalize_on_device(jnp.asarray(batch["images"])),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]

    m = evaluate_rec(model, params, dl, tok, num_beams=3, max_new_tokens=4)
    assert set(m) >= {"hr@3", "ndcg@5", "mrr@10", "items_per_sec", "n_users"}
    assert m["n_users"] == 4
    assert 0.0 <= m["hr@10"] <= 1.0

    ds_exp = TaskDataset(d, "beauty", "exp", "test", tok, n_items=24,
                         history_len=5, image_size=28, max_records=2)
    dl_exp = DataLoader(ds_exp, batch_size=2, pad_id=tok.pad_token_id,
                        shuffle=False, num_workers=0, drop_last=False)
    m2 = evaluate_exp(model, params, dl_exp, tok, num_beams=2,
                      max_new_tokens=6)
    assert {"mae", "rmse", "bleu", "rouge1", "rougeL", "meteor"} <= set(m2)
    assert m2["mae"] <= 4.0

    ds_sel = TaskDataset(d, "beauty", "img_sel", "test", tok, n_items=24,
                         history_len=5, image_size=28, max_records=2)
    dl_sel = DataLoader(ds_sel, batch_size=2, pad_id=tok.pad_token_id,
                        shuffle=False, num_workers=0, drop_last=False)
    m3 = evaluate_img_sel(model, params, dl_sel, tok, max_new_tokens=4)
    assert {"recall", "precision", "f1"} <= set(m3)


@pytest.mark.slow
def test_latent_cache_matches_pixel_path(tmp_path):
    """load_images=False (item-id batches + device latent cache) must
    reproduce the pixel path exactly: same latents, same generations,
    same metrics. The cache is the TPU eval fast path — each unique item
    is encoded once instead of once per mention (eval_rec.py:84-110)."""
    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.evals import evaluate_rec
    from unimp_tpu.evals.latent_cache import ItemLatentCache
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.tools import synth_data

    d = str(tmp_path)
    synth_data.generate(d, n_items=16, n_users=8, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=16)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 8))
    model = UniMPModel(cfg)

    def make_dl(load_images):
        ds = TaskDataset(d, "beauty", "rec", "test", tok, n_items=16,
                         history_len=5, image_size=28, max_records=4,
                         load_images=load_images)
        return ds, DataLoader(ds, batch_size=2, pad_id=tok.pad_token_id,
                              shuffle=False, num_workers=0,
                              pad_to_multiple=32, drop_last=False)

    ds_px, dl_px = make_dl(True)
    ds_id, dl_id = make_dl(False)

    batch_px = next(iter(dl_px))
    batch_id = next(iter(dl_id))
    assert "image_ids" in batch_id and "images" not in batch_id
    ids = jnp.asarray(batch_px["input_ids"])
    params = model.init(
        jax.random.PRNGKey(0), ids,
        vision_x=normalize_on_device(jnp.asarray(batch_px["images"])),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]

    # latents from the cache == latents from direct encode
    cache = ItemLatentCache(model, params, ds_id.item_image, ds_id.n_items,
                            chunk=4)
    lat_cache = np.asarray(cache.gather(batch_id["image_ids"]))
    lat_direct = np.asarray(model.apply(
        {"params": params},
        normalize_on_device(jnp.asarray(batch_px["images"])),
        method=UniMPModel.encode_vision,
    ))
    np.testing.assert_allclose(lat_cache, lat_direct, rtol=2e-5, atol=2e-5)

    m_px = evaluate_rec(model, params, dl_px, tok, num_beams=3,
                        max_new_tokens=4)
    m_id = evaluate_rec(model, params, dl_id, tok, num_beams=3,
                        max_new_tokens=4)
    for k in ("hr@3", "hr@5", "hr@10", "ndcg@10", "mrr@10", "n_users"):
        assert m_px[k] == m_id[k], k


@pytest.mark.slow
def test_mesh_sharded_eval_matches_unsharded(tmp_path):
    """evaluate_rec with a dp mesh (SPMD batched decode, row padding for
    shard divisibility) must produce the same metrics as the unsharded
    path — including a final partial batch that is not divisible by the
    mesh size."""
    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.evals import evaluate_rec
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.parallel import make_mesh
    from unimp_tpu.tools import synth_data

    d = str(tmp_path)
    synth_data.generate(d, n_items=16, n_users=36, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=16)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 8))
    model = UniMPModel(cfg)

    def make_dl():
        ds = TaskDataset(d, "beauty", "rec", "test", tok, n_items=16,
                         history_len=5, image_size=28, max_records=5,
                         load_images=False)
        assert len(ds) == 5
        # batch 3 over 5 records -> final batch of 2 (not divisible by 8)
        return DataLoader(ds, batch_size=3, pad_id=tok.pad_token_id,
                          shuffle=False, num_workers=0, pad_to_multiple=32,
                          drop_last=False, fixed_media=5)

    dl = make_dl()
    batch = next(iter(dl))
    ids = jnp.asarray(batch["input_ids"])
    b, m = batch["image_ids"].shape
    params = model.init(
        jax.random.PRNGKey(0), ids,
        vision_x=normalize_on_device(jnp.zeros((b, m, 28, 28, 3), jnp.uint8)),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]

    mesh = make_mesh(dp=None, fsdp=1, tp=1)  # 8-way dp
    m_plain = evaluate_rec(model, params, make_dl(), tok, num_beams=3,
                           max_new_tokens=4)
    m_mesh = evaluate_rec(model, params, make_dl(), tok, num_beams=3,
                          max_new_tokens=4, mesh=mesh)
    assert m_mesh["n_users"] == 5
    for k in ("hr@3", "hr@5", "hr@10", "ndcg@10", "mrr@10", "n_users"):
        assert m_plain[k] == m_mesh[k], k


def test_bertscore_greedy_match_math():
    from unimp_tpu.evals.bertscore import greedy_match_scores

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(1, 5, 16))
    mask = np.ones((1, 5), bool)
    p, r, f1 = greedy_match_scores(emb, mask, emb, mask)
    assert f1[0] == pytest.approx(1.0)  # identical -> perfect
    # disjoint one-hot embeddings -> zero cosine overlap
    a = np.eye(4)[None, :, :]
    b = np.roll(np.eye(4), 2, axis=1)[None, :, :]  # overlaps 2 of 4 dims
    m = np.ones((1, 4), bool)
    _, _, f_part = greedy_match_scores(a, m, b, m)
    assert f_part[0] == pytest.approx(1.0)  # same basis set, permuted
    c = np.concatenate([np.zeros((1, 4, 4)), np.eye(4)[None]], axis=-1)
    _, _, f_zero = greedy_match_scores(a, m, c[..., :4], m)
    assert f_zero[0] < 0.01
    # padding rows must not contribute
    mask2 = np.array([[True, True, False, False]])
    _, _, f_pad = greedy_match_scores(a, mask2, a, mask2)
    assert f_pad[0] == pytest.approx(1.0)


def test_model_bertscore_scorer(tmp_path):
    """Hermetic --eval_embed scorer: model text tower as the encoder
    (reference eval_exp.py:63-67 uses hub RoBERTa; here zero egress)."""
    from unimp_tpu.evals.bertscore import make_model_bertscore
    from unimp_tpu.models import UniMPModel, get_config
    from unimp_tpu.tools import synth_data

    d = str(tmp_path)
    synth_data.generate(d, n_items=16, n_users=4, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=16)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 8))
    model = UniMPModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )["params"]

    score = make_model_bertscore(model, params, tok, max_len=16, batch_size=2)
    cands = ["good quality cream", "item_1 item_2", "bad"]
    refs = ["good quality cream", "item_1 item_2", "nice serum smell"]
    f1 = score(cands, refs)
    assert f1.shape == (3,)
    assert f1[0] == pytest.approx(1.0, abs=1e-6)  # identical text
    assert f1[1] == pytest.approx(1.0, abs=1e-6)
    assert f1[2] < f1[0]
    assert score([], []).shape == (0,)
