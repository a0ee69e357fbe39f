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


# --- paraformer seg-dict tokenizer ------------------------------------------

def _seg_dict():
    return {"HELLO": "HE@@ LL@@ O", "WORLD": "WOR@@ LD", "OKAY": "OKAY"}


def test_paraformer_tokenize_by_seg_dict():
    from paper_accurate_fast_cheap_tpu.text.tokenizers import (
        tokenize_by_seg_dict,
    )

    toks = tokenize_by_seg_dict(_seg_dict(), "你好 HELLO WORLD 的")
    assert toks == ["你", "好", "HE@@", "LL@@", "O", "WOR@@", "LD", "的"]
    # out-of-dict word passes through whole
    assert tokenize_by_seg_dict(_seg_dict(), "FOO")[-1] == "FOO"


def test_paraformer_beautify_result():
    from paper_accurate_fast_cheap_tpu.text.tokenizers import (
        paraformer_beautify_result,
    )

    # all-alpha: @@ pieces glue, words space-separated
    assert paraformer_beautify_result(
        ["HE@@", "LL@@", "O", "WOR@@", "LD"]) == "HELLO WORLD"
    # all-CJK: plain concatenation
    assert paraformer_beautify_result(["你", "好"]) == "你好"
    # mixed: CJK adjacent to alpha word drops the trailing blank
    assert paraformer_beautify_result(
        ["你", "HE@@", "LL@@", "O", "好"]) == "你HELLO好"
    # specials are washed
    assert paraformer_beautify_result(
        ["<sos>", "你", "<eos>"]) == "你"


def test_paraformer_reference_parity():
    """Run the reference's own tokenize_by_seg_dict/beautify on shared
    inputs (`wenet/text/tokenize_utils.py`, `wenet/paraformer/search.py`)."""
    import importlib.util as ilu

    from paper_accurate_fast_cheap_tpu.text.tokenizers import (
        paraformer_beautify_result,
        tokenize_by_seg_dict,
    )

    spec = ilu.spec_from_file_location(
        "ref_tok_utils", "/root/reference/wenet/text/tokenize_utils.py")
    ref_tu = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref_tu)

    # paraformer/search.py imports torch + wenet; lift just the pure
    # beautify trio by executing its source up to the tensor code
    src = open("/root/reference/wenet/paraformer/search.py").read()
    ns = {"List": list, "Union": object, "Any": object}
    import re as _re
    funcs = _re.findall(
        r"(def (?:_isChinese|_isAllChinese|_isAllAlpha|"
        r"paraformer_beautify_result)\(.*?)(?=\ndef |\Z)", src, _re.S)
    from typing import Any, List, Union
    ns = {"Any": Any, "List": List, "Union": Union}
    for f in funcs:
        exec(f, ns)

    texts = ["你好 HELLO WORLD 的", "HELLO OKAY WORLD", "你 好",
             "FOO BAR 你好"]
    for txt in texts:
        ours = tokenize_by_seg_dict(_seg_dict(), txt)
        ref = ref_tu.tokenize_by_seg_dict(_seg_dict(), txt)
        assert ours == ref, (txt, ours, ref)
        assert paraformer_beautify_result(ours) == \
            ns["paraformer_beautify_result"](ours), txt


def test_paraformer_tokenizer_roundtrip(tmp_path):
    from paper_accurate_fast_cheap_tpu.text.tokenizers import (
        ParaformerTokenizer, init_tokenizer,
    )

    units = tmp_path / "units.txt"
    units.write_text("".join(
        f"{t} {i}\n" for i, t in enumerate(
            ["<blank>", "<unk>", "你", "好", "HE@@", "LL@@", "O"])))
    seg = tmp_path / "seg.txt"
    seg.write_text("HELLO\tHE@@ LL@@ O\n")
    tok = ParaformerTokenizer(str(units), str(seg))
    tokens, ids = tok.tokenize("你好 HELLO")
    assert tokens == ["你", "好", "HE@@", "LL@@", "O"]
    assert ids == [2, 3, 4, 5, 6]
    text, _ = tok.detokenize(ids)
    assert text == "你好HELLO"
    # registry route
    t2 = init_tokenizer({"tokenizer": "paraformer", "tokenizer_conf": {
        "symbol_table_path": str(units), "seg_dict_path": str(seg)}})
    assert t2.tokenize("你好 HELLO")[1] == ids
