"""Tokenizers: symbol tables, char, and the sentencepiece-free unigram."""
import struct

import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.text import tokenizers as tk
from paper_accurate_fast_cheap_tpu.utils.config import override_config


def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _sp_piece(piece, score, ptype=1):
    body = b""
    pb = piece.encode("utf-8")
    body += b"\x0a" + _varint(len(pb)) + pb          # field 1 string
    body += b"\x15" + struct.pack("<f", score)        # field 2 float
    body += b"\x18" + _varint(ptype)                  # field 3 enum
    return b"\x0a" + _varint(len(body)) + body        # ModelProto field 1


def _write_model(path, pieces):
    with open(path, "wb") as f:
        for p in pieces:
            f.write(_sp_piece(*p))


PIECES = [
    ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
    ("▁HE", -1.0, 1), ("LLO", -1.5, 1), ("▁WOR", -2.0, 1),
    ("LD", -1.0, 1), ("▁", -3.0, 1), ("H", -4.0, 1), ("E", -4.0, 1),
    ("L", -4.0, 1), ("O", -4.0, 1), ("W", -4.0, 1), ("R", -4.0, 1),
    ("D", -4.0, 1), ("<sw>", 0.0, 4), ("▁A", -1.2, 1),
]


@pytest.fixture
def spm_model(tmp_path):
    p = tmp_path / "toy.model"
    _write_model(str(p), PIECES)
    return str(p)


@pytest.fixture
def units(tmp_path):
    p = tmp_path / "units.txt"
    p.write_text("".join(f"{piece} {i}\n" for i, (piece, _, _)
                         in enumerate(PIECES)))
    return str(p)


def test_parse_model(spm_model):
    pieces = tk.parse_sentencepiece_model(spm_model)
    assert pieces[0] == ("<unk>", 0.0, 2)
    assert ("▁HE", -1.0, 1) in pieces


def test_unigram_viterbi_prefers_high_score_segmentation(spm_model):
    sp = tk.SentencePieceLike(spm_model)
    assert sp.encode("HELLO WORLD") == ["▁HE", "LLO", "▁WOR", "LD"]
    # ids map through piece table
    ids = sp.encode("HELLO WORLD", out_type=int)
    assert [sp.id_to_piece(i) for i in ids] == ["▁HE", "LLO", "▁WOR", "LD"]


def test_unigram_unknown_char_fallback(spm_model):
    sp = tk.SentencePieceLike(spm_model)
    toks = sp.encode("HZ")
    # Z is not in inventory -> single-char unknown surface kept
    assert "Z" in "".join(toks)


def test_rev_bpe_semantics(spm_model, units):
    tok = tk.RevBpeTokenizer(spm_model, units)
    tokens, ids = tok.tokenize("HELLO <sw> WORLD")
    assert tokens == ["▁HE", "LLO", "▁WOR", "LD"]
    text, toks = tok.detokenize(ids)
    assert text == "HELLO WORLD"


def test_char_tokenizer(tmp_path):
    st = {"<blank>": 0, "<unk>": 1, "a": 2, "b": 3, "c": 4}
    tok = tk.CharTokenizer(st)
    tokens, ids = tok.tokenize("abc")
    assert tokens == ["a", "b", "c"]
    assert ids == [2, 3, 4]
    assert tok.detokenize(ids)[0] == "abc"
    # unknown char maps to unk
    assert tok.tokenize("axb")[1] == [2, 1, 3]


def test_whitespace_tokenizer():
    tok = tk.WhitespaceTokenizer({"<unk>": 0, "hello": 1, "world": 2})
    tokens, ids = tok.tokenize("hello world zzz")
    assert ids == [1, 2, 0]


def test_init_tokenizer_dispatch(spm_model, units):
    cfg = {"tokenizer": "rev_bpe",
           "tokenizer_conf": {"bpe_path": spm_model,
                              "symbol_table_path": units}}
    tok = tk.init_tokenizer(cfg)
    assert isinstance(tok, tk.RevBpeTokenizer)
    assert tok.vocab_size() == len(PIECES)


def test_override_config():
    cfg = {"a": {"b": 1}, "c": 2}
    out = override_config(cfg, ["a.b=5", "c=hello", "d.e=0.5"])
    assert out["a"]["b"] == 5 and out["c"] == "hello"
    assert out["d"]["e"] == 0.5
    assert cfg["a"]["b"] == 1  # original untouched
