"""Hermetic tokenizer for the personalization framework.

The reference relies on each backbone's pretrained HF tokenizer and
extends it with task tokens (/root/reference/UniMP/mmrec.py:537-595).
This framework is hermetic (no hub access): the default tokenizer is a
word-level model built from the dataset corpus, backed by the Rust
`tokenizers` library for fast longest-match handling of the thousands of
added item/image tokens. A pretrained HF tokenizer (local files) can be
wrapped with `UniMPTokenizer.from_hf` for checkpoint-parity runs.

Atomic added-token matching matters: semantic-id answers are emitted
without separators ("item_3item_17item_last_9", rec_dataset.py:414-417)
and VQGAN tokens carry a trailing comma ("img_789,", mmrec.py:578-581);
the Rust AddedVocabulary performs exactly the longest-match segmentation
these require.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Iterable, List, Optional, Sequence

from tokenizers import AddedToken, Tokenizer
from tokenizers.models import WordLevel
from tokenizers.pre_tokenizers import Sequence as PreSeq
from tokenizers.pre_tokenizers import Punctuation, Whitespace

PAD, UNK, BOS, EOS = "<pad>", "<unk>", "<s>", "</s>"
MEDIA_TOKEN = "<image>"
ENDOFCHUNK_TOKEN = "<|endofchunk|>"
ANSWER_TOKEN = "<answer>"

_WORD_RE = re.compile(r"\w+|[^\w\s]")


class UniMPTokenizer:
    """HF-compatible-surface tokenizer (encode/decode/add_tokens/len)."""

    def __init__(self, tk: Tokenizer):
        self._tk = tk
        self._special = {PAD, UNK, BOS, EOS, MEDIA_TOKEN, ENDOFCHUNK_TOKEN}
        # decode strategy follows the underlying model: WordLevel joins
        # tokens with spaces; subword models (BPE/Unigram/WordPiece from
        # a pretrained tokenizer.json) use the Rust decoder so merges and
        # byte-level prefixes reconstruct the original text. Detected
        # here (not flagged at construction) so save()/load() round-trips
        # keep the right behavior.
        try:
            model_type = json.loads(tk.to_str()).get("model", {}).get("type")
        except Exception:
            model_type = "WordLevel"
        self._wordlevel = model_type == "WordLevel"

    # ---------------- construction ----------------

    @classmethod
    def from_corpus(
        cls,
        texts: Iterable[str],
        min_freq: int = 1,
        max_vocab: Optional[int] = None,
    ) -> "UniMPTokenizer":
        counter: Counter = Counter()
        for t in texts:
            counter.update(w.lower() for w in _WORD_RE.findall(t))
        words = [w for w, c in counter.most_common(max_vocab) if c >= min_freq]
        vocab = {PAD: 0, UNK: 1, BOS: 2, EOS: 3}
        for w in words:
            vocab[w] = len(vocab)
        tk = Tokenizer(WordLevel(vocab, unk_token=UNK))
        tk.pre_tokenizer = PreSeq([Whitespace(), Punctuation()])
        tk.normalizer = None
        obj = cls(tk)
        obj._add_core_specials()
        return obj

    @classmethod
    def from_vocab(cls, vocab: dict) -> "UniMPTokenizer":
        tk = Tokenizer(WordLevel(vocab, unk_token=UNK))
        tk.pre_tokenizer = PreSeq([Whitespace(), Punctuation()])
        obj = cls(tk)
        obj._add_core_specials()
        return obj

    @classmethod
    def from_hf(cls, tokenizer_json_path: str) -> "UniMPTokenizer":
        """Wrap a locally-available pretrained tokenizer.json (the
        checkpoint-parity path: a real BPE/sentencepiece base extended
        with thousands of atomic task tokens, reference
        mmrec.py:537-595). Framework-standard special tokens that the
        pretrained vocab lacks are ADDED (never silently aliased), so
        pad/bos/eos/media lookups always resolve."""
        tk = Tokenizer.from_file(tokenizer_json_path)
        obj = cls(tk)
        missing = [
            AddedToken(t, normalized=False, special=True)
            for t in (PAD, UNK, BOS, EOS)
            if tk.token_to_id(t) is None
        ]
        if missing:
            tk.add_special_tokens(missing)
        obj._add_core_specials()
        return obj

    def _add_core_specials(self):
        self._tk.add_special_tokens(
            [
                AddedToken(MEDIA_TOKEN, normalized=False),
                AddedToken(ENDOFCHUNK_TOKEN, normalized=False),
            ]
        )

    # ---------------- persistence ----------------

    def save(self, path: str):
        self._tk.save(path)

    @classmethod
    def load(cls, path: str) -> "UniMPTokenizer":
        return cls(Tokenizer.from_file(path))

    # ---------------- HF-ish surface ----------------

    def add_tokens(self, tokens: Sequence[str], special: bool = False) -> int:
        toks = [
            AddedToken(t, normalized=False, special=special, lstrip=False, rstrip=False)
            for t in tokens
        ]
        if special:
            self._special.update(tokens)
            return self._tk.add_special_tokens(toks)
        return self._tk.add_tokens(toks)

    def add_special_tokens(self, mapping: dict) -> int:
        """HF-style: {"additional_special_tokens": [...]} etc."""
        n = 0
        for value in mapping.values():
            if isinstance(value, str):
                value = [value]
            n += self.add_tokens(value, special=True)
            self._special.update(value)
        return n

    def encode(
        self,
        text: str,
        add_bos: bool = False,
        add_eos: bool = False,
    ) -> List[int]:
        ids = self._tk.encode(text, add_special_tokens=False).ids
        if add_bos:
            ids = [self.bos_token_id] + ids
        if add_eos:
            ids = ids + [self.eos_token_id]
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        if not self._wordlevel:
            # subword base: Rust decoder reconstructs text (added tokens
            # are emitted verbatim and adjacent, matching the reference's
            # "item_3item_17" semantic-id answer strings)
            return self._tk.decode(
                [int(i) for i in ids], skip_special_tokens=skip_special_tokens
            )
        toks = []
        for i in ids:
            t = self._tk.id_to_token(int(i))
            if t is None:
                continue
            if skip_special_tokens and t in self._special:
                continue
            toks.append(t)
        return " ".join(toks)

    def batch_decode(self, batch, skip_special_tokens: bool = True):
        return [self.decode(ids, skip_special_tokens) for ids in batch]

    def convert_tokens_to_ids(self, token: str) -> int:
        tid = self._tk.token_to_id(token)
        if tid is None:
            raise KeyError(f"token {token!r} not in vocabulary")
        return tid

    def __len__(self) -> int:
        return self._tk.get_vocab_size(with_added_tokens=True)

    @property
    def vocab_size(self) -> int:
        return len(self)

    @property
    def pad_token_id(self) -> int:
        return self._tk.token_to_id(PAD)

    @property
    def unk_token_id(self) -> int:
        return self._tk.token_to_id(UNK)

    @property
    def bos_token_id(self) -> int:
        return self._tk.token_to_id(BOS)

    @property
    def eos_token_id(self) -> int:
        return self._tk.token_to_id(EOS)

    @property
    def media_token_id(self) -> int:
        return self._tk.token_to_id(MEDIA_TOKEN)

    @property
    def endofchunk_token_id(self) -> int:
        return self._tk.token_to_id(ENDOFCHUNK_TOKEN)

    @property
    def answer_token_id(self) -> int:
        tid = self._tk.token_to_id(ANSWER_TOKEN)
        if tid is None:
            raise KeyError("<answer> not added yet; call extend_vocabulary")
        return tid
