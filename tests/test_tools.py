"""Tooling tests: K-core, splits, img_sel/keep_exp derivation, semantic
IDs, retrieval neighbors, VQ tokenizer round-trip, torch converter."""

import json
import os

import numpy as np
import pytest

from unimp_tpu.tools import synth_data
from unimp_tpu.tools.preprocess import (
    check_kcore,
    filter_kcore,
    reindex_items,
    split_users,
)
from unimp_tpu.tools.task_data import gen_img_sel, keep_exp


def test_kcore_filter():
    rng = np.random.default_rng(0)
    users = {
        f"u{i}": [[int(x), "", 3] for x in rng.integers(0, 30, rng.integers(2, 15))]
        for i in range(40)
    }
    out = filter_kcore(users, user_core=5, item_core=4)
    _, _, ok = check_kcore(out, 5, 4)
    assert ok
    assert 0 < len(out) <= len(users)


def test_reindex_and_split():
    users = {
        "a": [["x", "", 3], ["y", "", 4]],
        "b": [["y", "", 1], ["z", "", 2]],
        **{f"u{i}": [["x", "", 3], ["z", "", 3]] for i in range(18)},
    }
    seqs, raw2id = reindex_items(users)
    assert set(raw2id.values()) == {0, 1, 2}
    assert seqs["a"][0][0] == raw2id["x"]
    tr, ev, te = split_users(seqs)
    assert len(tr) + len(ev) + len(te) == len(users)
    assert not (set(tr) & set(ev)) and not (set(ev) & set(te))


def test_gen_img_sel_and_keep_exp():
    rng = np.random.default_rng(1)
    users = {
        f"u{i}": [[int(j), "words here" if j % 2 else "", 3]
                  for j in rng.choice(40, 12, replace=False)]
        for i in range(10)
    }
    sel = gen_img_sel(users, set(range(40)), rng)
    for seq in sel.values():
        trailer = seq[-1]
        item_set, labels = trailer[-2], trailer[-1]
        assert len(item_set) == 3
        assert all(0 <= l < 3 for l in labels)
        assert len(labels) in (1, 2)
        # positives really are in the candidate set
        positives = [t[0] for t in trailer[:-2]]
        for l in labels:
            assert item_set[l] in positives

    kept = keep_exp(users, "train")
    for seq in kept.values():
        assert all(it[1] != "" for it in seq)
        assert len(seq) >= 6


def test_semantic_ids_and_retrieval(tmp_path):
    from unimp_tpu.tools.features import (
        add_retrieval_neighbors,
        build_semantic_ids,
        cosine_topk,
    )

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(50, 16))
    nbrs = cosine_topk(feats, k=5)
    assert nbrs.shape == (50, 5)
    assert all(i not in nbrs[i] for i in range(50))

    out = str(tmp_path / "id2semantic.json")
    mapping = build_semantic_ids(feats, list(range(50)), out,
                                 codes_per_level=8, last_codes=4)
    assert len(mapping) == 50
    parts = mapping["0"].split(",")
    assert len(parts) == 4
    assert all(int(p) >= 0 for p in parts)
    # distinct items get distinct full codes (collision-resolved)
    assert len(set(mapping.values())) == 50

    d = str(tmp_path / "ds")
    synth_data.generate(d, n_items=16, n_users=8, image_size=28)
    ids = list(range(16))
    add_retrieval_neighbors(d, "beauty", feats[:16], ids, k=3)
    with open(os.path.join(d, "meta_beauty.json")) as f:
        meta = json.load(f)
    assert len(meta["0"]["retrieval"]) == 3


def test_vq_tokenizer_roundtrip(tmp_path):
    from unimp_tpu.tools.vqgan import PatchVQTokenizer

    rng = np.random.default_rng(0)
    # structured images so the codebook learns something
    base = rng.integers(0, 255, (8, 1, 1, 3), dtype=np.uint8)
    imgs = np.repeat(np.repeat(base, 64, axis=1), 64, axis=2)
    imgs = (imgs + rng.integers(0, 20, imgs.shape)).clip(0, 255).astype(np.uint8)
    vq = PatchVQTokenizer(patch=16, pca_dim=8, codebook_size=32).fit(imgs)
    toks = vq.encode(imgs)
    assert toks.shape == (8, 16)
    assert toks.max() < 32
    rec = vq.decode(toks)
    assert rec.shape == (8, 64, 64, 3)
    # reconstruction of near-constant images should be close
    err = np.abs(rec.astype(int) - imgs.astype(int)).mean()
    assert err < 40, err

    p = str(tmp_path / "cb.npz")
    vq.save(p)
    vq2 = PatchVQTokenizer.load(p)
    np.testing.assert_array_equal(vq2.encode(imgs), toks)


def test_torch_converter_roundtrip():
    import torch

    from unimp_tpu.tools.convert_torch import convert_state_dict

    target = {
        "vision": {"block_0": {"mlp": {"up": {"kernel": np.zeros((4, 8)),
                                              "bias": np.zeros(8)}}}},
        "embed": {"embedding": np.zeros((10, 4))},
    }
    sd = {
        "vision_encoder.vision_model.encoder.layers.0.mlp.fc1.weight":
            np.arange(32).reshape(8, 4).astype(np.float32),
        "vision_encoder.vision_model.encoder.layers.0.mlp.fc1.bias":
            np.ones(8, np.float32),
        # identity-path name with embedding growth 8 -> 10 rows
        "embed.embedding": np.ones((8, 4), np.float32),
        "unknown.param": np.zeros(3),
    }
    out, report = convert_state_dict(sd, target)
    np.testing.assert_array_equal(
        out["vision"]["block_0"]["mlp"]["up"]["kernel"],
        np.arange(32).reshape(8, 4).T,
    )
    assert out["embed"]["embedding"][:8].sum() == 32
    assert (out["embed"]["embedding"][8:] == 0).all()
    assert "unknown.param" in report["missed"]
    assert len(report["matched"]) == 3


def test_synth_to_training_files(tmp_path):
    """preprocess-format invariants on the synthetic generator output."""
    d = str(tmp_path)
    info = synth_data.generate(d, n_items=24, n_users=12, image_size=28)
    for split in ("train", "eval", "test"):
        with open(os.path.join(d, f"{split}_users.json")) as f:
            users = json.load(f)
        assert users
        for seq in users.values():
            assert all(len(it) == 3 for it in seq)
    assert info["n_items"] == 24


def test_native_image_pipeline(tmp_path):
    from PIL import Image

    from unimp_tpu.data import native
    from unimp_tpu.data.transforms import preprocess_uint8

    if not native.available():
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    paths, blobs, pil_out = [], [], []
    for i in range(6):
        arr = rng.integers(0, 255, (80 + i * 7, 64, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
        with open(p, "rb") as f:
            blobs.append(f.read())
        pil_out.append(preprocess_uint8(np.asarray(Image.open(p).convert("RGB")), 56))

    # single decode matches PIL within resize-filter tolerance
    one = native.decode_resize(blobs[0], 56)
    assert one.shape == (56, 56, 3)
    diff = np.abs(one.astype(int) - pil_out[0].astype(int)).mean()
    assert diff < 8.0, diff

    # batch decode, multithreaded
    batch = native.decode_resize_batch(blobs, 56, n_threads=3)
    assert batch.shape == (6, 56, 56, 3)
    np.testing.assert_array_equal(batch[0], one)

    # corrupt input -> zero-filled slot, no crash
    bad = native.decode_resize_batch([b"not a jpeg", blobs[1]], 56)
    assert (bad[0] == 0).all()
    assert not (bad[1] == 0).all()


def test_misc_converters_and_webdata(tmp_path):
    from unimp_tpu.data.webdata import ShardedJsonlDataset
    from unimp_tpu.tools.misc_converters import (
        apply_delta,
        make_delta,
        shard_jsonl,
    )

    base = {"a": np.ones((2, 2)), "b": {"c": np.zeros(3)}}
    target = {"a": np.full((2, 2), 3.0), "b": {"c": np.arange(3.0)}}
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    np.testing.assert_allclose(back["a"], target["a"])
    np.testing.assert_allclose(back["b"]["c"], target["b"]["c"])

    recs = [{"i": i, "text": f"doc {i}"} for i in range(25)]
    paths = shard_jsonl(recs, str(tmp_path / "shards"),
                        max_records_per_shard=10)
    assert len(paths) == 3

    ds = ShardedJsonlDataset(str(tmp_path / "shards" / "shard-*.jsonl"),
                             seed=1, shuffle_buffer=8)
    got = sorted(r["i"] for r in ds)
    assert got == list(range(25))
    # epoch changes the order deterministically
    ds.set_epoch(0)
    o0 = [r["i"] for r in ds]
    ds.set_epoch(1)
    o1 = [r["i"] for r in ds]
    ds.set_epoch(0)
    assert [r["i"] for r in ds] == o0
    assert o0 != o1
    # host sharding partitions shards
    d0 = ShardedJsonlDataset(str(tmp_path / "shards" / "shard-*.jsonl"),
                             process_index=0, process_count=3)
    d1 = ShardedJsonlDataset(str(tmp_path / "shards" / "shard-*.jsonl"),
                             process_index=1, process_count=3)
    assert len(list(d0)) + len(list(d1)) <= 25


def test_mimicit_train_index(tmp_path):
    """get_SN_train_data semantics: keep each conversation's FINAL round
    (reference get_SN_train_data.py:14-44) with its rel_ins_ids."""
    import json

    from unimp_tpu.tools.misc_converters import build_mimicit_train_index

    data = {
        "SN_00_INS_scene0_00_act0_round0": {
            "instruction": "a", "answer": "x", "image_ids": ["i0"],
            "rel_ins_ids": []},
        "SN_00_INS_scene0_00_act0_round1": {
            "instruction": "b", "answer": "y", "image_ids": ["i1"],
            "rel_ins_ids": ["SN_00_INS_scene0_00_act0_round0"]},
        "SN_00_INS_scene1_00_act0_round0": {
            "instruction": "c", "answer": "z", "image_ids": ["i2"],
            "rel_ins_ids": []},
    }
    src = tmp_path / "ins.json"
    src.write_text(json.dumps({"data": data}))
    out = tmp_path / "train.json"
    idx = build_mimicit_train_index(str(src), str(out))
    assert set(idx) == {"SN_00_INS_scene0_00_act0_round1",
                        "SN_00_INS_scene1_00_act0_round0"}
    assert idx["SN_00_INS_scene0_00_act0_round1"] == [
        "SN_00_INS_scene0_00_act0_round0"]
    assert json.loads(out.read_text()) == idx


def test_img_gen_decode_closure(tmp_path):
    """Generated token strings decode back to images (end-to-end img_gen)."""
    import json

    from unimp_tpu.tools.vqgan import (
        PatchVQTokenizer,
        decode_generation_dump,
        parse_img_tokens,
    )

    assert parse_img_tokens("img_789,img_591,") == [789, 591]
    assert parse_img_tokens("img_12 img_bad img_5000 img_3") == [12, 3]

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 224, 224, 3), dtype=np.uint8)
    vq = PatchVQTokenizer(patch=16, pca_dim=8, codebook_size=64).fit(imgs)
    cb = str(tmp_path / "cb.npz")
    vq.save(cb)
    toks = vq.encode(imgs)[0][: 14 * 14]
    dump = str(tmp_path / "dump.json")
    json.dump([{"generated": "".join(f"img_{t}," for t in toks),
                "target": "", "item": 0}], open(dump, "w"))
    paths = decode_generation_dump(dump, cb, str(tmp_path / "out"))
    assert len(paths) == 1
    from PIL import Image

    assert Image.open(paths[0]).size == (224, 224)


def test_llava_train_index(tmp_path):
    """get_llava_train_data.py semantics (pipeline/utils/
    get_llava_train_data.py:6-71): CONV keeps final rounds only, drops
    zero-context samples, pads by repetition, takes the LAST n; non-CONV
    keeps every id, takes the FIRST n."""
    import json

    from unimp_tpu.tools.misc_converters import llava_train_index

    data = {
        # conversation 7: three rounds
        "LACONV_00_INS_7_0": {"rel_ins_ids": []},
        "LACONV_00_INS_7_1": {"rel_ins_ids": ["LACONV_00_INS_7_0"]},
        "LACONV_00_INS_7_2": {"rel_ins_ids": ["LACONV_00_INS_7_0",
                                              "LACONV_00_INS_7_1"]},
        # conversation 8: single round, empty context -> dropped
        "LACONV_00_INS_8_0": {"rel_ins_ids": []},
        # single-round family: first-n + repetition padding
        "LACR_I2I_00_INS_a": {"rel_ins_ids": ["x", "y", "z"]},
        "LACR_I2I_00_INS_b": {"rel_ins_ids": ["w"]},
        "LACR_I2I_00_INS_c": {"rel_ins_ids": []},
    }
    src = tmp_path / "ins.json"
    src.write_text(json.dumps({"data": data}))
    out = tmp_path / "train.json"
    idx = llava_train_index(str(src), str(out), rel_ins_ids_num=2)
    assert idx["LACONV_00_INS_7_2"] == ["LACONV_00_INS_7_0",
                                        "LACONV_00_INS_7_1"]
    assert "LACONV_00_INS_8_0" not in idx       # zero-context CONV dropped
    assert "LACONV_00_INS_7_1" not in idx       # non-final round dropped
    assert idx["LACR_I2I_00_INS_a"] == ["x", "y"]   # FIRST n
    assert idx["LACR_I2I_00_INS_b"] == ["w", "w"]   # repetition padding
    assert idx["LACR_I2I_00_INS_c"] == []           # kept with []
    assert json.loads(out.read_text()) == idx


def test_llava_instructions_from_conversations(tmp_path):
    import json

    from unimp_tpu.tools.misc_converters import (
        collect_image_index,
        llava_instructions_from_conversations,
    )

    rows = [
        {"id": "33471", "conversations": [
            {"from": "human", "value": "<image>\nwhat is it"},
            {"from": "gpt", "value": "a cat"},
            {"from": "human", "value": "what color"},
            {"from": "gpt", "value": "black"},
        ]},
    ]
    src = tmp_path / "conversation_58k.json"
    src.write_text(json.dumps(rows))

    out = tmp_path / "LACONV_instructions.json"
    res = llava_instructions_from_conversations(str(src), str(out),
                                                mode="conv")
    d = res["data"]
    assert set(d) == {"LACONV_00_INS_33471_0", "LACONV_00_INS_33471_1"}
    r1 = d["LACONV_00_INS_33471_1"]
    assert r1["instruction"] == "what color"
    assert r1["rel_ins_ids"] == ["LACONV_00_INS_33471_0"]
    assert r1["image_ids"] == ["LA_00_IMG_33471"]
    assert "<image>" not in d["LACONV_00_INS_33471_0"]["instruction"]
    assert res["meta"]["author"] == "ntu"

    out2 = tmp_path / "LACR_instructions.json"
    res2 = llava_instructions_from_conversations(
        str(src), str(out2), mode="single",
        similarity={"33471": ["99", "98"]})
    d2 = res2["data"]
    assert set(d2) == {"LACR_I2I_00_INS_33471"}
    assert d2["LACR_I2I_00_INS_33471"]["rel_ins_ids"] == [
        "LACR_I2I_00_INS_99", "LACR_I2I_00_INS_98"]

    # image index from 8-col TSVs with dedup + round-suffix strip
    tsv = tmp_path / "conv.tsv"
    tsv.write_text("33471_2\timg/a.jpg\tc\tq\tr\tg\tds\tt\n"
                   "33471_3\timg/a.jpg\tc\tq\tr\tg\tds\tt\n"
                   "555\timg/b.jpg\tc\tq\tr\tg\tds\tt\n")
    outi = tmp_path / "images.json"
    imgs = collect_image_index([str(tsv)], str(outi),
                               strip_round_suffix=True)
    assert imgs == {"33471": {"id": "33471", "image": "img/a.jpg"},
                    "555": {"id": "555", "image": "img/b.jpg"}}
