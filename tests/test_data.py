"""Data layer tests: tokenizer, vocab, masking golden, prompts, pipeline."""

import numpy as np
import pytest

from unimp_tpu.data.masking import (
    answer_span_labels,
    answer_span_labels_reference,
)
from unimp_tpu.data.tokenizer import UniMPTokenizer
from unimp_tpu.data.vocab import extend_vocabulary
from unimp_tpu.tools import synth_data


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    synth_data.generate(str(d), n_items=32, n_users=24, image_size=28)
    return str(d)


@pytest.fixture(scope="module")
def tokenizer(data_dir):
    return synth_data.build_tokenizer(data_dir, n_items=32)


def test_tokenizer_roundtrip_and_added_tokens(tokenizer):
    tok = tokenizer
    ids = tok.encode("<image> Category makeup Brand lumera <answer> item_7 <|endofchunk|>")
    assert tok.media_token_id in ids
    assert tok.answer_token_id in ids
    assert tok.convert_tokens_to_ids("item_7") in ids
    # special tokens skipped on decode
    text = tok.decode(ids)
    assert "<image>" not in text and "item_7" in text

    # atomic longest-match: semantic ids concatenated without separators
    ids2 = tok.encode("item_3item_17")
    assert tok.convert_tokens_to_ids("item_3") in ids2
    assert tok.convert_tokens_to_ids("item_17") in ids2
    assert len([i for i in ids2 if i != tok.unk_token_id]) == 2

    # img tokens carry the trailing comma (mmrec.py:578-581)
    ids3 = tok.encode("img_789,img_591,")
    assert ids3 == [
        tok.convert_tokens_to_ids("img_789,"),
        tok.convert_tokens_to_ids("img_591,"),
    ]


def test_vocab_counts():
    tok = UniMPTokenizer.from_corpus(["hello world"])
    base = len(tok)
    n = extend_vocabulary(tok, subset="netflix")
    # <answer> + 1870 items + 5 rates + 5 sel + 1024 img
    assert n == 1 + 1870 + 5 + 5 + 1024
    assert len(tok) == base + n


def test_masking_matches_reference_loop():
    rng = np.random.default_rng(0)
    ANS, EOC, MEDIA, PAD = 3, 4, 5, 0
    for _ in range(20):
        ids = rng.integers(6, 50, size=(4, 64))
        # sprinkle structure tokens
        for row in ids:
            pos = sorted(rng.choice(64, size=rng.integers(2, 12), replace=False))
            for p in pos:
                row[p] = rng.choice([ANS, EOC, MEDIA])
            row[rng.integers(50, 64):] = PAD
        got = np.asarray(answer_span_labels(ids, ANS, EOC, MEDIA, PAD))
        want = answer_span_labels_reference(ids, ANS, EOC, MEDIA, PAD)
        np.testing.assert_array_equal(got, want)


def test_prompt_formats(data_dir, tokenizer):
    import json
    import os

    from unimp_tpu.data.prompts import PromptBuilder

    with open(os.path.join(data_dir, "meta_beauty.json")) as f:
        meta = json.load(f)
    with open(os.path.join(data_dir, "train_users.json")) as f:
        users = json.load(f)
    pb = PromptBuilder(
        subset="all", meta_data=meta, history_len=5, n_items=32
    )
    rng = np.random.default_rng(0)
    rec = list(users.values())[0]

    s = pb.train_rec(rec, rng)
    assert s.weight == 2.0
    assert s.text.count("<image>") == 5
    assert s.text.count("<answer>") == 6
    assert s.text.count("<|endofchunk|>") == 5
    assert "What is the next item recommended to the user? <answer> item_" in s.text
    assert len(s.image_ids) == 5

    e = pb.eval_rec(rec)
    assert e.text.endswith("What is the next item recommended to the user? <answer>")
    assert e.text.count("<image>") == 4  # seq[-5:-1]
    assert e.target == f"item_{rec[-1][0]}"

    s2 = pb.train_search(rec, rng)
    assert "What is the related item ID to the query based on the history?" in s2.text
    assert s2.weight == 1.0

    s3 = pb.train_exp(rec, rng)
    assert "What is the rating and explanation for the item? <answer> rate_" in s3.text
    assert s3.text.count("<image>") == 5

    e3 = pb.eval_exp(rec)
    assert e3.target["rating"] == rec[-1][2]

    # img_sel needs the [item_set, gt] trailer
    with open(os.path.join(data_dir, "train_beauty_img_sel.json")) as f:
        sel = json.load(f)
    rec_sel = list(sel.values())[0]
    s4 = pb.train_img_sel(rec_sel, rng)
    assert s4.text.startswith("User history: ")
    assert "Select from: " in s4.text
    assert "Can you select the suitable item from above for the user? <answer> s_" in s4.text
    assert s4.text.count("Selection s_") == 3
    e4 = pb.eval_img_sel(rec_sel)
    assert e4.text.count("Selection s_") == len(rec_sel[-1][-2])
    assert e4.target == rec_sel[-1][-1]


def test_img_gen_prompts(data_dir):
    import json
    import os

    from unimp_tpu.data.prompts import PromptBuilder

    with open(os.path.join(data_dir, "meta_beauty.json")) as f:
        meta = json.load(f)
    with open(os.path.join(data_dir, "img_id2semantic.json")) as f:
        img_sem = json.load(f)
    with open(os.path.join(data_dir, "search_merge_train.txt")) as f:
        seqs = json.load(f)
    pb = PromptBuilder(
        subset="all", meta_data=meta, history_len=2, n_items=32,
        img_id2semantic=img_sem,
    )
    rng = np.random.default_rng(0)
    s = pb.train_img_gen(seqs[0], rng)
    assert "What is the generated image ID to the query based on the history? <answer> img_" in s.text
    assert s.text.count("<image>") == 2
    e = pb.eval_img_gen(seqs[0])
    assert e.text.endswith("Image ID to the query based on the history? <answer>")
    assert e.target.startswith("img_")

    # pretrain variant: exact strings (rec_dataset.py:550 train /
    # :588 eval — note "image" vs "Image" and space-joined img ids)
    item = next(iter(meta))
    sid = " ".join(f"img_{i}" for i in img_sem[str(item)])
    query = " ".join(str(meta[str(item)]["title"]).split()[:30])
    t = pb.train_img_gen_pretrain(item, rng)
    assert t.text == (
        f"Query: {query}. What is the generated image ID to the query? "
        f"<answer> {sid}"
    )
    assert t.image_ids == [item] and t.weight == 1.0
    ev = pb.eval_img_gen_pretrain(item)
    assert ev.text == (
        f"Query: {query}. What is the generated Image ID to the query? "
        "<answer>"
    )
    assert ev.target == sid and ev.extra == {"item": item}


def test_img_gen_pretrain_dataset(data_dir, tokenizer):
    """img_gen_pretrain iterates the catalog; samples tokenize + train."""
    from unimp_tpu.data.dataset import TaskDataset

    ds = TaskDataset(
        data_dir, "beauty", "img_gen_pretrain", "train", tokenizer,
        n_items=32, history_len=2, image_size=28,
    )
    assert len(ds) == 32  # one record per catalog item
    s = ds[0]
    assert s["input_ids"].dtype == np.int32
    assert s["images"].shape[0] == 1
    ev = TaskDataset(
        data_dir, "beauty", "img_gen_pretrain", "test", tokenizer,
        n_items=32, history_len=2, image_size=28, max_records=4,
    )[0]
    assert ev["target"].startswith("img_")


def test_dataset_and_loader(data_dir, tokenizer):
    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader

    ds = TaskDataset(
        data_dir, "beauty", ["img_sel", "search", "rec", "exp"], "train",
        tokenizer, n_items=32, history_len=5, image_size=28,
    )
    assert len(ds) > 0
    sample = ds[0]
    assert sample["input_ids"].dtype == np.int32
    assert sample["images"].ndim == 4

    dl = DataLoader(ds, batch_size=4, pad_id=tokenizer.pad_token_id,
                    num_workers=2, pad_to_multiple=32)
    batch = next(iter(dl))
    assert batch["input_ids"].shape[0] == 4
    assert batch["input_ids"].shape[1] % 32 == 0
    assert batch["images"].shape[0] == 4
    assert (batch["seq_len"] > 0).all()
    # bos/eos framing on train samples
    assert (batch["input_ids"][:, 0] == tokenizer.bos_token_id).all()

    # host sharding covers the dataset disjointly
    dl0 = DataLoader(ds, batch_size=2, pad_id=0, shuffle=False,
                     process_index=0, process_count=2, num_workers=0)
    dl1 = DataLoader(ds, batch_size=2, pad_id=0, shuffle=False,
                     process_index=1, process_count=2, num_workers=0)
    assert len(dl0) + len(dl1) <= len(ds) // 2 + 1


def test_eval_dataset(data_dir, tokenizer):
    from unimp_tpu.data.dataset import TaskDataset

    ds = TaskDataset(
        data_dir, "beauty", "rec", "test", tokenizer,
        n_items=32, history_len=5, image_size=28,
    )
    s = ds[0]
    assert "target" in s and s["target"].startswith("item_")
    # eval samples are unframed (no bos/eos), matching eval_rec protocol
    assert s["input_ids"][0] != tokenizer.bos_token_id


def test_hm_netflix_meta_formats():
    """Per-subset meta extractors (rec_dataset.py:341-370 semantics)."""
    from unimp_tpu.data.prompts import PromptBuilder

    meta_nf = {"0": [2001, "The Matrix Reloaded"], "1": [1999, "The Matrix"]}
    pb = PromptBuilder(subset="netflix", meta_data=meta_nf, history_len=3,
                       n_items=2)
    assert pb.extract_meta(0) == "Title The Matrix Reloaded Release Date 2001"

    meta_hm = {"0": ["Slim Jeans", "Denim", "Dark Blue", "Menswear",
                     "five pocket jeans"]}
    pb2 = PromptBuilder(subset="hm", meta_data=meta_hm, history_len=8,
                        n_items=1)
    s = pb2.extract_meta(0)
    assert s == ("Name Slim Jeans Appearance Denim Color Dark Blue "
                 "Section Menswear")

    # eval windows: hm uses the last 20 (rec_dataset.py:463-466)
    seq = [[0, "", 3]] * 25
    e = pb2.eval_rec(seq)
    assert e.text.count("<image>") == 19  # seq[-20:-1]


def test_semantic_id_prompts():
    """--use_semantic answer formats (rec_dataset.py:414-427,885-893)."""
    import numpy as np

    from unimp_tpu.data.prompts import PromptBuilder

    meta = {str(i): {"category": "c", "brand": "b", "title": "t",
                     "price": "1", "keywords": "k"} for i in range(10)}
    id2sem = {str(i): f"{i},{i+1},{i+2},{i % 4}" for i in range(10)}
    pb = PromptBuilder(subset="all", meta_data=meta, history_len=3,
                       n_items=10, use_semantic=True, id2semantic=id2sem)
    rng = np.random.default_rng(0)
    seq = [[i, "", 3] for i in range(6)]
    s = pb.train_rec(seq, rng)
    # rec train: joined WITHOUT separators; 4th code uses item_last_
    assert "item_3item_4item_5item_last_3" in s.text.replace("item_0item_1", "x") or \
        any(f"item_{i}item_{i+1}item_{i+2}item_last_{i%4}" in s.text for i in range(6))
    # search: joined WITH spaces (rec_dataset.py:868)
    s2 = pb.train_search(seq, rng)
    assert any(
        f"item_{i} item_{i+1} item_{i+2} item_last_{i%4}" in s2.text
        for i in range(6)
    )


def test_loader_bounded_inflight(data_dir, tokenizer):
    """The threaded loader keeps at most num_workers+prefetch batches in
    flight instead of submitting the whole epoch up front."""
    import threading

    from unimp_tpu.data.dataset import TaskDataset
    from unimp_tpu.data.loader import DataLoader

    ds = TaskDataset(data_dir, "beauty", "rec", "train", tokenizer,
                     n_items=32, history_len=5, image_size=28)
    dl = DataLoader(ds, batch_size=2, pad_id=tokenizer.pad_token_id,
                    num_workers=2, prefetch=1, pad_to_multiple=32)
    peak = 0
    lock = threading.Lock()
    live = 0
    orig = dl._make_batch

    def counting(bi):
        nonlocal peak, live
        with lock:
            live += 1
            peak = max(peak, live)
        try:
            return orig(bi)
        finally:
            with lock:
                live -= 1
    dl._make_batch = counting

    batches = list(dl)
    assert len(batches) == len(dl)
    # only num_workers(2) batches can *run* concurrently
    assert peak <= 2


def test_from_hf_bpe_base_atomic_task_tokens(tmp_path):
    """Checkpoint-parity tokenizer path (reference mmrec.py:537-595): a
    real byte-level BPE base loaded via from_hf, extended with the full
    task-token set — longest-match atomicity must hold on the BPE base
    exactly as on the hermetic word-level one."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder

    corpus = [
        "the user bought a bright red lipstick and a soft face cream",
        "what item does the user prefer next? history of purchases",
        "item description: volumizing mascara, brand lumera, rating five",
    ] * 4
    tk = Tokenizer(BPE(unk_token="<unk>"))
    tk.pre_tokenizer = ByteLevel(add_prefix_space=True)
    tk.decoder = ByteLevelDecoder()
    tk.train_from_iterator(
        corpus, BpeTrainer(vocab_size=300, special_tokens=["<unk>"])
    )
    path = str(tmp_path / "bpe_tokenizer.json")
    tk.save(path)

    tok = UniMPTokenizer.from_hf(path)
    base = len(tok)
    n = extend_vocabulary(tok, subset="beauty", use_semantic=True)
    assert len(tok) == base + n

    # semantic-id answers concatenate with NO separator (rec_dataset.py
    # :414-417): must segment into exactly the three added tokens
    ids = tok.encode("item_3item_17item_last_9")
    assert ids == [
        tok.convert_tokens_to_ids("item_3"),
        tok.convert_tokens_to_ids("item_17"),
        tok.convert_tokens_to_ids("item_last_9"),
    ]
    # longest match: item_17 must win over item_1 + "7"
    assert tok.convert_tokens_to_ids("item_1") not in ids

    # VQGAN tokens keep the trailing comma (mmrec.py:578-581)
    ids3 = tok.encode("img_789,img_591,")
    assert ids3 == [
        tok.convert_tokens_to_ids("img_789,"),
        tok.convert_tokens_to_ids("img_591,"),
    ]

    # task tokens embedded in real BPE text keep their boundaries
    sent = "the user bought item_12 and rated it rate_5"
    ids4 = tok.encode(sent)
    assert tok.convert_tokens_to_ids("item_12") in ids4
    assert tok.convert_tokens_to_ids("rate_5") in ids4
    decoded = tok.decode(ids4)
    assert "item_12" in decoded and "rate_5" in decoded
    assert "bought" in decoded  # BPE merges reconstructed by the decoder

    # eval answer protocol: text after "?" (eval_rec.py:111-125)
    q = tok.encode("what does the user prefer next?item_7")
    assert tok.decode(q).split("?")[-1].replace(" ", "") == "item_7"

    # core specials resolve even though the BPE base lacked them
    assert tok.pad_token_id is not None and tok.eos_token_id is not None
    assert tok.media_token_id is not None

    # save/load round-trips the subword decode behavior
    p2 = str(tmp_path / "saved.json")
    tok.save(p2)
    tok2 = UniMPTokenizer.load(p2)
    assert tok2.encode("item_3item_17item_last_9") == ids
    assert tok2.decode(ids4) == decoded
