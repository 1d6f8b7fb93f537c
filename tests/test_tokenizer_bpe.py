"""CLIP BPE algorithm tests with a synthetic vocab/merges pair.

The real 49k-entry vocab is a hub artifact; the BPE machinery (merge ranking,
end-of-word markers, byte encoding, padding) is exercised here with a small
hand-built vocabulary.
"""

import json

import numpy as np
import pytest

from vdx.models.tokenizer import (
    BOS_ID,
    CONTEXT_LENGTH,
    EOS_ID,
    CLIPTokenizer,
    bytes_to_unicode,
    load_tokenizer,
)


@pytest.fixture()
def tiny_tokenizer(tmp_path):
    # vocabulary: single chars + a few merges, CLIP-style </w> end markers
    chars = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = [
        ("c", "a"),          # 'ca'
        ("ca", "t</w>"),     # 'cat</w>'
        ("d", "o"),          # 'do'
        ("do", "g</w>"),     # 'dog</w>'
    ]
    for pair in merges:
        tok = "".join(pair)
        if tok not in vocab:
            vocab[tok] = len(vocab)

    vocab_path = tmp_path / "vocab.json"
    merges_path = tmp_path / "merges.txt"
    vocab_path.write_text(json.dumps(vocab))
    merges_path.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges)
    )
    return CLIPTokenizer.from_files(str(vocab_path), str(merges_path)), vocab


class TestBPE:
    def test_merges_applied_in_rank_order(self, tiny_tokenizer):
        tok, vocab = tiny_tokenizer
        ids = tok.encode("cat")
        assert ids == [vocab["cat</w>"]]
        ids = tok.encode("dog")
        assert ids == [vocab["dog</w>"]]

    def test_unmergeable_falls_to_chars(self, tiny_tokenizer):
        tok, vocab = tiny_tokenizer
        ids = tok.encode("ba")
        assert ids == [vocab["b"], vocab["a</w>"]]

    def test_lowercasing_and_whitespace(self, tiny_tokenizer):
        tok, _ = tiny_tokenizer
        assert tok.encode("  CAT  ") == tok.encode("cat")
        assert tok.encode("cat   dog") == tok.encode("cat dog")

    def test_padding_contract(self, tiny_tokenizer):
        tok, _ = tiny_tokenizer
        out = tok(["cat dog"])
        assert out.shape == (1, CONTEXT_LENGTH)
        assert out[0, 0] == BOS_ID
        ids = tok.encode("cat dog")
        assert list(out[0, 1 : 1 + len(ids)]) == ids
        assert out[0, 1 + len(ids)] == EOS_ID
        assert (out[0, 2 + len(ids):] == EOS_ID).all()

    def test_byte_table_bijective(self):
        table = bytes_to_unicode()
        assert len(table) == 256
        assert len(set(table.values())) == 256

    def test_load_tokenizer_fallback(self):
        tok = load_tokenizer("/nonexistent/vocab.json", "/nonexistent/merges.txt")
        out = tok(["hello"])
        assert out.shape == (1, CONTEXT_LENGTH)
        assert out[0, 0] == BOS_ID
