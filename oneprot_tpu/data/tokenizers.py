"""First-party tokenizers matching the reference's token-id surface.

The reference uses `transformers.AutoTokenizer` for ESM2 and BERT vocabularies
(reference src/data/datasets/text_dataset.py:25-26, struct_token_dataset.py:38-43).
The TPU build ships its own tokenizers: (a) zero download/network dependency,
(b) tokenization is on the host hot path (SURVEY §3.5) and these are simple
enough to later move to C++, (c) we control padding → static bucketed shapes.

Token-id tables are bit-identical to the published ESM2 / fair-esm alphabets
so checkpoints converted from HF weights see identical inputs.
"""

from __future__ import annotations

import json
import os
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# ESM2 alphabet (matches facebook/esm2_* vocab.txt and fair-esm Alphabet)
# ---------------------------------------------------------------------------

ESM2_TOKENS: Tuple[str, ...] = (
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
)

# The 21 structure tokens the reference appends for SaProt/foldseek 3Di
# (reference src/data/datasets/struct_token_dataset.py:38, in this order).
STRUCT_3DI_TOKENS: Tuple[str, ...] = (
    "p", "y", "n", "w", "r", "q", "h", "g", "d", "l",
    "v", "t", "m", "f", "s", "a", "e", "i", "k", "c", "#",
)


class EsmTokenizer:
    """Character-level protein tokenizer with the ESM2 vocabulary.

    Encodes as ``<cls> + residues + <eos>``, pads with ``<pad>`` (id 1), same
    as HF's EsmTokenizer used throughout the reference data layer.
    """

    def __init__(self, extra_tokens: Sequence[str] = ()):  # struct: +21 3Di
        self.tokens: List[str] = list(ESM2_TOKENS) + list(extra_tokens)
        self.vocab: Dict[str, int] = {t: i for i, t in enumerate(self.tokens)}
        self.cls_token_id = self.vocab["<cls>"]
        self.pad_token_id = self.vocab["<pad>"]
        self.eos_token_id = self.vocab["<eos>"]
        self.unk_token_id = self.vocab["<unk>"]
        self.mask_token_id = self.vocab["<mask>"]
        # byte->id LUT for the native fast path (single-char tokens only)
        self._lut = np.full(256, self.unk_token_id, np.int32)
        for tok, idx in self.vocab.items():
            if len(tok) == 1:
                self._lut[ord(tok)] = idx

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    def encode_ids(self, sequence: str, max_length: Optional[int] = None) -> List[int]:
        ids = [self.cls_token_id]
        body_limit = None if max_length is None else max_length - 2
        body = sequence if body_limit is None else sequence[:body_limit]
        for ch in body:
            ids.append(self.vocab.get(ch, self.unk_token_id))
        ids.append(self.eos_token_id)
        return ids

    def __call__(
        self,
        sequences: Sequence[str],
        max_length: Optional[int] = None,
        padding: str = "longest",  # "longest" | "max_length" | int bucket
        pad_to_multiple_of: Optional[int] = None,
    ) -> np.ndarray:
        """Tokenize a batch to a padded int32 array [B, L]."""
        if padding == "max_length":
            if max_length is None:
                raise ValueError("padding='max_length' requires max_length")
            target = max_length
        elif isinstance(padding, int):
            target = padding
        else:
            lengths = [len(s) + 2 for s in sequences]
            if max_length is not None:
                lengths = [min(l, max_length) for l in lengths]
            target = max(lengths) if lengths else 2
        if pad_to_multiple_of:
            target = -(-target // pad_to_multiple_of) * pad_to_multiple_of
        if max_length is not None:
            target = min(target, max_length) if padding == "longest" else target
        from oneprot_tpu import native

        fast = native.tokenize_batch(
            sequences, self._lut, self.cls_token_id, self.eos_token_id,
            self.pad_token_id,
            max_len=max_length if max_length is not None else target,
            pad_to=target)
        if fast is not None:
            return fast
        out = np.full((len(sequences), target), self.pad_token_id,
                      dtype=np.int32)
        # re-encode with the final target as the hard cap so <eos> survives
        # bucket truncation (HF truncation keeps the final special token)
        cap = target if max_length is None else min(max_length, target)
        for i, seq in enumerate(sequences):
            ids = self.encode_ids(seq, cap)
            out[i, : len(ids)] = ids
        return out

    def decode(self, ids: Iterable[int]) -> str:
        specials = {self.cls_token_id, self.pad_token_id, self.eos_token_id}
        return "".join(self.tokens[i] for i in ids if i not in specials)


def esm2_tokenizer() -> EsmTokenizer:
    return EsmTokenizer()


def struct_token_tokenizer() -> EsmTokenizer:
    """ESM2 tokenizer + 21 3Di tokens (ids 33..53), matching the reference's
    `tokenizer.add_tokens(new_tokens)` (struct_token_dataset.py:38-40)."""
    return EsmTokenizer(extra_tokens=STRUCT_3DI_TOKENS)


# ---------------------------------------------------------------------------
# MSA batch converter (fair-esm MSA-Transformer alphabet)
# ---------------------------------------------------------------------------


class MsaBatchConverter:
    """Converts a batch of MSAs to a padded [B, R, C] token tensor.

    Mirrors fair-esm's MSA alphabet behaviour used by the reference
    (msa_dataset.py:27-31): same token table as ESM2, prepend <cls> per row,
    NO <eos>, pad id 1, rows truncated to `truncation_seq_length` columns.
    """

    def __init__(self, truncation_seq_length: int = 1022):
        self.tok = EsmTokenizer()
        self.truncation_seq_length = truncation_seq_length
        self.padding_idx = self.tok.pad_token_id

    def encode_row(self, seq: str) -> List[int]:
        seq = seq[: self.truncation_seq_length]
        return [self.tok.cls_token_id] + [
            self.tok.vocab.get(ch, self.tok.unk_token_id) for ch in seq
        ]

    def __call__(
        self,
        msas: Sequence[Sequence[Tuple[str, str]]],
        max_rows: Optional[int] = None,
        pad_rows_to: Optional[int] = None,
        pad_cols_to: Optional[int] = None,
    ) -> np.ndarray:
        batch_rows = []
        for msa in msas:
            rows = [self.encode_row(seq) for _, seq in msa]
            if max_rows is not None:
                rows = rows[:max_rows]
            batch_rows.append(rows)
        R = max(len(rows) for rows in batch_rows)
        C = max(len(r) for rows in batch_rows for r in rows)
        if pad_rows_to:
            R = max(R, pad_rows_to)
        if pad_cols_to:
            C = max(C, pad_cols_to)
        out = np.full((len(batch_rows), R, C), self.padding_idx, dtype=np.int32)
        for b, rows in enumerate(batch_rows):
            for r, ids in enumerate(rows):
                out[b, r, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# WordPiece tokenizer (BERT-style, for the biomedical text encoder)
# ---------------------------------------------------------------------------


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


class WordPieceTokenizer:
    """BERT-compatible WordPiece tokenizer (basic tokenize + greedy subwords).

    Load a real BiomedBERT/SciBERT ``vocab.txt`` for parity with the
    reference's text pipeline (text_dataset.py:25); tests use a tiny synthetic
    vocab so the suite is hermetic.
    """

    def __init__(
        self,
        vocab: Dict[str, int],
        do_lower_case: bool = True,
        max_chars_per_word: int = 100,
    ):
        self.vocab = vocab
        self.ids_to_tokens = {i: t for t, i in vocab.items()}
        self.do_lower_case = do_lower_case
        self.max_chars_per_word = max_chars_per_word
        self.cls_token_id = vocab["[CLS]"]
        self.sep_token_id = vocab["[SEP]"]
        self.pad_token_id = vocab["[PAD]"]
        self.unk_token_id = vocab["[UNK]"]

    @classmethod
    def from_vocab_file(cls, path: str, do_lower_case: bool = True) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, "r", encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    vocab[tok] = i
        return cls(vocab, do_lower_case=do_lower_case)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # -- basic tokenization ------------------------------------------------
    def _basic_tokenize(self, text: str) -> List[str]:
        if self.do_lower_case:
            # HF BertTokenizer(do_lower_case=True) semantics: lowercase,
            # then NFD + strip combining marks ('naïve' -> 'naive'). NFC
            # without accent stripping sent accented words to [UNK],
            # diverging from the converted BiomedBERT's training pipeline
            text = text.lower()
            text = unicodedata.normalize("NFD", text)
            text = "".join(ch for ch in text
                           if unicodedata.category(ch) != "Mn")
        else:
            text = unicodedata.normalize("NFC", text)
        out: List[str] = []
        word: List[str] = []
        for ch in text:
            if ch.isspace():
                if word:
                    out.append("".join(word))
                    word = []
            elif _is_punctuation(ch):
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
        return out

    # -- wordpiece ----------------------------------------------------------
    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur: Optional[int] = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_token_id]
            ids.append(cur)
            start = end
        return ids

    def encode_ids(self, text: str, max_length: Optional[int] = None) -> List[int]:
        ids = [self.cls_token_id]
        for word in self._basic_tokenize(text):
            ids.extend(self._wordpiece(word))
        body_limit = None if max_length is None else max_length - 1
        if body_limit is not None:
            ids = ids[:body_limit]
        ids.append(self.sep_token_id)
        return ids

    def __call__(
        self,
        texts: Sequence[str],
        max_length: Optional[int] = None,
        padding: str = "longest",
        pad_to_multiple_of: Optional[int] = None,
    ) -> np.ndarray:
        encoded = [self.encode_ids(t, max_length) for t in texts]
        if padding == "max_length":
            target = max_length
        elif isinstance(padding, int):
            target = padding
        else:
            target = max(len(e) for e in encoded) if encoded else 2
        if pad_to_multiple_of:
            target = -(-target // pad_to_multiple_of) * pad_to_multiple_of
        out = np.full((len(encoded), target), self.pad_token_id, dtype=np.int32)
        for i, ids in enumerate(encoded):
            ids = ids[:target]
            out[i, : len(ids)] = ids
        return out


_BASE_BERT_SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def tiny_wordpiece_vocab(extra_words: Sequence[str] = ()) -> Dict[str, int]:
    """A small deterministic vocab for hermetic tests and synthetic data."""
    tokens = list(_BASE_BERT_SPECIALS)
    tokens += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    tokens += ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    tokens += [str(d) for d in range(10)]
    tokens += [".", ",", "-", "(", ")"]
    tokens += ["protein", "binding", "enzyme", "structure", "the", "a",
               "catalytic", "membrane", "site", "domain", "activity",
               "##ase", "##ing", "##s"]
    tokens += list(extra_words)
    return {t: i for i, t in enumerate(dict.fromkeys(tokens))}


def resolve_text_tokenizer(name_or_path: str) -> WordPieceTokenizer:
    """Resolve a text tokenizer: a vocab.txt path, a HF-style dir, or the
    built-in tiny vocab for synthetic/debug configs."""
    if name_or_path in ("tiny", "synthetic", None, ""):
        return WordPieceTokenizer(tiny_wordpiece_vocab())
    if os.path.isdir(name_or_path):
        vocab_file = os.path.join(name_or_path, "vocab.txt")
        if os.path.isfile(vocab_file):
            return WordPieceTokenizer.from_vocab_file(vocab_file)
        vjson = os.path.join(name_or_path, "vocab.json")
        if os.path.isfile(vjson):
            with open(vjson) as f:
                return WordPieceTokenizer(json.load(f))
    if os.path.isfile(name_or_path):
        return WordPieceTokenizer.from_vocab_file(name_or_path)
    # A real model name (e.g. the reference's BiomedBERT,
    # reference src/data/datasets/text_dataset.py:25) without a local vocab
    # is an error: silently tokenizing with the tiny debug vocab would
    # poison training quality. Use name "tiny"/"synthetic" explicitly for
    # hermetic configs, or point at a downloaded checkpoint dir.
    raise FileNotFoundError(
        f"text tokenizer {name_or_path!r}: no local vocab.txt/vocab.json "
        f"found and downloads are unavailable. Pass a local checkpoint "
        f"dir/vocab file, or use 'tiny' for synthetic debug runs.")
