"""Tokenizer tests: ESM2 alphabet ids, 3Di extension, WordPiece, MSA."""

import numpy as np
import pytest

from oneprot_tpu.data.tokenizers import (
    ESM2_TOKENS,
    STRUCT_3DI_TOKENS,
    EsmTokenizer,
    MsaBatchConverter,
    WordPieceTokenizer,
    esm2_tokenizer,
    struct_token_tokenizer,
    tiny_wordpiece_vocab,
)


# whole-file tier0: part of the ~2-minute smoke subset for the inner dev
# loop (`make test-quick`, VERDICT r4 next-step 7)
pytestmark = pytest.mark.tier0



def test_esm2_vocab_layout():
    tok = esm2_tokenizer()
    # canonical ESM2 special ids (facebook/esm2_* vocab.txt)
    assert tok.cls_token_id == 0
    assert tok.pad_token_id == 1
    assert tok.eos_token_id == 2
    assert tok.unk_token_id == 3
    assert tok.mask_token_id == 32
    assert tok.vocab_size == 33
    assert tok.vocab["L"] == 4 and tok.vocab["A"] == 5 and tok.vocab["-"] == 30


def test_esm2_encode_roundtrip():
    tok = esm2_tokenizer()
    ids = tok(["MKTAY", "MK"], padding="longest")
    assert ids.shape == (2, 7)  # cls + 5 + eos
    assert ids[0, 0] == 0 and ids[0, -1] == 2
    assert ids[1, 4] == 1  # padded
    assert tok.decode(ids[0]) == "MKTAY"


def test_esm2_truncation_matches_reference_semantics():
    # reference: tokenizer(max_length=1024, truncation=True) keeps cls+eos
    tok = esm2_tokenizer()
    ids = tok(["A" * 2000], max_length=1024)
    assert ids.shape[1] == 1024
    assert ids[0, 0] == 0 and ids[0, -1] == 2


def test_struct_tokenizer_adds_21_tokens():
    tok = struct_token_tokenizer()
    assert tok.vocab_size == 54
    # first added token id is 33 in the order of the reference's list
    # (struct_token_dataset.py:38)
    assert tok.vocab["p"] == 33
    assert tok.vocab["#"] == 53
    ids = tok(["pynw"], padding="longest")
    assert list(ids[0]) == [0, 33, 34, 35, 36, 2]


def test_bucketed_padding():
    tok = esm2_tokenizer()
    ids = tok(["MKT"], padding=16)
    assert ids.shape == (1, 16)
    ids = tok(["MKT"], padding="longest", pad_to_multiple_of=8)
    assert ids.shape == (1, 8)


def test_msa_batch_converter():
    conv = MsaBatchConverter()
    msas = [
        [("q", "MKT"), ("h1", "MAT")],
        [("q", "MKTAY")],
    ]
    out = conv(msas)
    assert out.shape == (2, 2, 6)  # rows padded to 2, cols to cls+5
    assert out[0, 0, 0] == 0  # per-row cls
    assert out[1, 1, 0] == 1  # padded row
    # no eos in MSA rows (fair-esm alphabet append_eos=False)
    assert 2 not in out[0, 0]


def test_wordpiece_basic():
    tok = WordPieceTokenizer(tiny_wordpiece_vocab())
    ids = tok(["Protein binding."], padding="longest")
    toks = [tok.ids_to_tokens[i] for i in ids[0]]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert "protein" in toks and "binding" in toks and "." in toks


def test_wordpiece_subwords_and_unk():
    tok = WordPieceTokenizer(tiny_wordpiece_vocab())
    ids = tok.encode_ids("kinase")  # 'kinase' absent -> k + ##... greedy
    toks = [tok.ids_to_tokens[i] for i in ids]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert "[UNK]" not in toks  # decomposes into chars/##ase
    ids2 = tok.encode_ids("ΔΔ")  # chars outside vocab -> UNK
    assert tok.unk_token_id in ids2


def test_wordpiece_strips_accents_like_hf():
    """HF BertTokenizer(do_lower_case=True) lowercases then NFD-strips
    combining marks ('naïve' -> 'naive'); NFC without stripping sent every
    accented word to [UNK], silently diverging from the converted
    BiomedBERT's training pipeline."""
    tok = WordPieceTokenizer(tiny_wordpiece_vocab())
    ids = tok.encode_ids("éé")  # é -> e, in the char vocab
    toks = [tok.ids_to_tokens[i] for i in ids]
    assert "[UNK]" not in toks and "e" in toks
    # composed and decomposed forms of the same text tokenize identically
    import unicodedata as _ud

    composed = "naïve"
    decomposed = _ud.normalize("NFD", composed)
    assert tok.encode_ids(composed) == tok.encode_ids(decomposed)
    # accent-stripped form matches the plain-ascii spelling
    assert tok.encode_ids(composed) == tok.encode_ids("naive")


def test_text_tokenizer_unknown_name_fails_loudly():
    """A real HF model name without a local vocab must error, not silently
    fall back to the tiny debug vocab (VERDICT r1 #9)."""
    import pytest as _pytest

    from oneprot_tpu.data.tokenizers import resolve_text_tokenizer

    with _pytest.raises(FileNotFoundError, match="text tokenizer"):
        resolve_text_tokenizer(
            "microsoft/BiomedNLP-BiomedBERT-base-uncased-abstract-fulltext")
    # explicit tiny names still work
    assert resolve_text_tokenizer("tiny") is not None
