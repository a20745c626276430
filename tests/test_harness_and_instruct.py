"""Tests: benchmark-harness metrics + loops, instruction datasets."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from unimp_tpu.evals.benchmark_harness import cider_d, vqa_accuracy


def test_cider():
    # idf needs a multi-document corpus (like the real COCO eval)
    refs = [
        ["a cat sits on a mat", "the cat is on the mat"],
        ["a dog runs quickly", "dogs run fast"],
        ["a red lipstick on a table", "lipstick placed on the table"],
    ]
    exact_preds = ["a cat sits on a mat", "a dog runs quickly",
                   "a red lipstick on a table"]
    wrong_preds = ["totally unrelated words here", "nothing in common",
                   "gibberish tokens only"]
    exact = cider_d(exact_preds, refs)
    wrong = cider_d(wrong_preds, refs)
    assert exact > 1.0
    assert wrong < exact * 0.2
    assert cider_d([], []) == 0.0


def test_vqa_accuracy_rule():
    answers = ["blue", "blue", "blue", "light blue", "navy", "blue",
               "blue", "azure", "blue", "blue"]
    assert vqa_accuracy("Blue.", answers) == 1.0
    assert vqa_accuracy("the blue", answers) == 1.0  # article dropped
    assert 0.0 < vqa_accuracy("light blue", answers) < 1.0
    assert vqa_accuracy("red", answers) == 0.0


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.tools import synth_data

    d = str(tmp_path_factory.mktemp("vlm"))
    synth_data.generate(d, n_items=16, n_users=8, image_size=28)
    tok = synth_data.build_tokenizer(d, n_items=16)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=len(tok) + 8))
    model = UniMPModel(cfg)
    import jax.numpy as jnp

    ids = jnp.ones((1, 8), jnp.int32).at[0, 1].set(tok.media_token_id)
    img = cfg.vision.image_size
    params = model.init(
        jax.random.PRNGKey(0), ids,
        vision_x=jnp.zeros((1, 1, img, img, 3), jnp.float32),
        q_media=compute_q_media(ids, tok.media_token_id),
    )["params"]
    return d, tok, cfg, model, params


def test_caption_vqa_classification_loops(tiny_model, tmp_path):
    from unimp_tpu.evals.benchmark_harness import (
        evaluate_captioning,
        evaluate_classification,
        evaluate_vqa,
    )

    d, tok, cfg, model, params = tiny_model
    img_dir = os.path.join(d, "beauty")
    images = [os.path.join(img_dir, f"{i}.jpg") for i in range(4)]
    cap_manifest = str(tmp_path / "cap.json")
    json.dump(
        [{"image": p, "captions": ["soft cream", "bright serum"]}
         for p in images],
        open(cap_manifest, "w"),
    )
    m = evaluate_captioning(model, params, tok, cap_manifest, num_shots=1,
                            image_size=cfg.vision.image_size, limit=2,
                            max_new_tokens=4)
    assert "cider" in m and m["n"] == 2

    vqa_manifest = str(tmp_path / "vqa.json")
    json.dump(
        [{"image": p, "question": "what is shown",
          "answers": ["cream"] * 10} for p in images],
        open(vqa_manifest, "w"),
    )
    m2 = evaluate_vqa(model, params, tok, vqa_manifest, limit=2,
                      image_size=cfg.vision.image_size, max_new_tokens=3)
    assert 0.0 <= m2["vqa_accuracy"] <= 1.0

    cls_manifest = str(tmp_path / "cls.json")
    json.dump([{"image": images[0], "label": 0},
               {"image": images[1], "label": 1}], open(cls_manifest, "w"))
    m3 = evaluate_classification(
        model, params, tok, cls_manifest, ["cream", "serum"],
        image_size=cfg.vision.image_size,
    )
    assert m3["n"] == 2 and 0.0 <= m3["top1"] <= 1.0


def test_instruct_dataset(tiny_model, tmp_path):
    from unimp_tpu.data.instruct_dataset import FileDataset, MultiInstructDataset

    d, tok, cfg, model, params = tiny_model
    ann = {
        "data": {
            "a": {"instruction": "what color", "answer": "blue",
                  "image_ids": [0], "rel_ins_ids": ["b"]},
            "b": {"instruction": "what shape", "answer": "round",
                  "image_ids": [1], "rel_ins_ids": []},
        }
    }
    ann_path = str(tmp_path / "mimicit.json")
    json.dump(ann, open(ann_path, "w"))
    ds = MultiInstructDataset(ann_path, os.path.join(d, "beauty"), tok,
                              image_size=cfg.vision.image_size)
    assert len(ds) == 2
    s = ds[0]  # sample "a" pulls in-context sample "b" first
    assert s["images"].shape[0] == 2
    text = tok.decode(s["input_ids"], skip_special_tokens=False)
    assert text.count("<image>") == 2
    assert text.count("<answer>") == 2

    tsv = str(tmp_path / "rows.tsv")
    with open(tsv, "w") as f:
        for i in range(10):
            f.write(f"{i}\tcol{i}\textra\n")
    f0 = FileDataset(tsv, selected_cols="0,1", rank=0, world_size=2)
    f1 = FileDataset(tsv, selected_cols="0,1", rank=1, world_size=2)
    rows0, rows1 = list(f0), list(f1)
    assert len(rows0) == 5 and len(rows1) == 5
    assert rows0[0] == ["0", "col0"] and rows1[0] == ["1", "col1"]
