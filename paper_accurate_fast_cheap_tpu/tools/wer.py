"""WER computation + GigaSpeech scoring rules.

Parity targets: `tools/compute-wer.py` (Levenshtein word alignment,
ins/del/sub counts, per-utt and overall WER), `tools/compute-wer-giga.py:13-31`
(GigaSpeech post-processing: uppercase, hyphen split, drop conversational
fillers / <UNK> tags / punctuation tags before scoring), and the macro
aggregation of `local/gigaspeech_scoring_longform.py:218-238` (micro-avg WER
+ ins/del/sub rates + stdev across files; fstalign replaced by the same
Levenshtein alignment in python).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

CONVERSATIONAL_FILLERS = [
    "UH", "UHH", "UM", "EH", "MM", "HM", "AH", "HUH", "HA", "ER", "OOF",
    "HEE", "ACH", "EEE", "EW",
]
UNK_TAGS = ["<UNK>", "<unk>"]
GIGASPEECH_PUNCTUATIONS = [
    "<COMMA>", "<PERIOD>", "<QUESTIONMARK>", "<EXCLAMATIONPOINT>",
]
GIGASPEECH_GARBAGE_TAGS = ["<SIL>", "<NOISE>", "<MUSIC>", "<OTHER>"]
NON_SCORING_WORDS = set(
    CONVERSATIONAL_FILLERS + UNK_TAGS + GIGASPEECH_PUNCTUATIONS
    + GIGASPEECH_GARBAGE_TAGS
)


def gigaspeech_post_process(text: str) -> str:
    """uppercase, hyphen -> space, drop non-scoring words."""
    text = text.upper().replace("-", " ")
    return " ".join(w for w in text.split() if w not in NON_SCORING_WORDS)


@dataclasses.dataclass
class AlignStats:
    ref_len: int = 0
    sub: int = 0
    ins: int = 0
    dele: int = 0

    @property
    def errors(self) -> int:
        return self.sub + self.ins + self.dele

    @property
    def wer(self) -> float:
        return self.errors / max(self.ref_len, 1)

    def __iadd__(self, other: "AlignStats"):
        self.ref_len += other.ref_len
        self.sub += other.sub
        self.ins += other.ins
        self.dele += other.dele
        return self


def align_words(ref: Sequence[str], hyp: Sequence[str]) -> AlignStats:
    """Levenshtein alignment with uniform costs (sub=del=ins=1).

    Uses the native C++ DP (`native/pafc_native.cpp`) when available — the
    long-form scorer aligns multi-thousand-word episodes — with a python
    fallback."""
    from paper_accurate_fast_cheap_tpu import native

    R, H = len(ref), len(hyp)
    ids = {}
    for w in ref:
        ids.setdefault(w, len(ids))
    for w in hyp:
        ids.setdefault(w, len(ids))
    counts = native.levenshtein_counts(
        np.asarray([ids[w] for w in ref], np.int32),
        np.asarray([ids[w] for w in hyp], np.int32),
    )
    if counts is not None:
        sub, dele, ins = counts
        return AlignStats(ref_len=R, sub=sub, ins=ins, dele=dele)
    # dp[i][j]: (cost, op) over ref[:i], hyp[:j]
    cost = np.zeros((R + 1, H + 1), np.int32)
    cost[:, 0] = np.arange(R + 1)
    cost[0, :] = np.arange(H + 1)
    for i in range(1, R + 1):
        for j in range(1, H + 1):
            s = cost[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1])
            d = cost[i - 1, j] + 1
            ins = cost[i, j - 1] + 1
            cost[i, j] = min(s, d, ins)
    # backtrack counting ops
    i, j = R, H
    st = AlignStats(ref_len=R)
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i, j] == cost[i - 1, j - 1] + (
            ref[i - 1] != hyp[j - 1]
        ):
            if ref[i - 1] != hyp[j - 1]:
                st.sub += 1
            i, j = i - 1, j - 1
        elif i > 0 and cost[i, j] == cost[i - 1, j] + 1:
            st.dele += 1
            i -= 1
        else:
            st.ins += 1
            j -= 1
    return st


_CER_SPACES = [" ", "\t", "\r", "\n"]
_CER_PUNCTS = [
    "!", ",", "?", "、", "。", "！", "，", "；", "？", "：", "「", "」",
    "︰", "『", "』", "《", "》",
]


def characterize(string: str) -> List[str]:
    """Split text into CER units (`tools/compute-cer.py:16-47`): CJK
    letters one per unit, ASCII runs grouped into words, `<...>` tags kept
    whole, punctuation/space dropped."""
    import unicodedata

    res: List[str] = []
    i = 0
    while i < len(string):
        char = string[i]
        if char in _CER_PUNCTS:
            i += 1
            continue
        cat1 = unicodedata.category(char)
        if cat1 in ("Zs", "Cn") or char in _CER_SPACES:
            i += 1
            continue
        if cat1 == "Lo":      # letter-other (CJK etc.)
            res.append(char)
            i += 1
            continue
        sep = ">" if char == "<" else " "
        j = i + 1
        while j < len(string):
            c = string[j]
            if ord(c) >= 128 or c in _CER_SPACES or c == sep:
                break
            j += 1
        if j < len(string) and string[j] == ">":
            j += 1
        res.append(string[i:j])
        i = j
    return res


def read_trn(path: str) -> Dict[str, str]:
    """'key text...' per line."""
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if not parts:
                continue
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def compute_wer(
    refs: Dict[str, str],
    hyps: Dict[str, str],
    gigaspeech_filter: bool = False,
    to_upper: bool = False,
    to_char: bool = False,
) -> Tuple[AlignStats, Dict[str, AlignStats]]:
    total = AlignStats()
    per_utt = {}
    for key, ref_text in refs.items():
        hyp_text = hyps.get(key, "")
        if gigaspeech_filter:
            ref_text = gigaspeech_post_process(ref_text)
            hyp_text = gigaspeech_post_process(hyp_text)
        elif to_upper:
            ref_text, hyp_text = ref_text.upper(), hyp_text.upper()
        if to_char:
            ref_toks = characterize(ref_text)
            hyp_toks = characterize(hyp_text)
        else:
            ref_toks, hyp_toks = ref_text.split(), hyp_text.split()
        st = align_words(ref_toks, hyp_toks)
        per_utt[key] = st
        total += st
    return total, per_utt


def longform_summary(per_file: Dict[str, AlignStats]) -> Dict[str, float]:
    """Micro-avg WER + rates + stdev across files
    (`gigaspeech_scoring_longform.py:218-238` summary.txt contract)."""
    total = AlignStats()
    wers = []
    for st in per_file.values():
        total += st
        wers.append(st.wer)
    return {
        "num_files": len(per_file),
        "wer": total.wer,
        "ins_rate": total.ins / max(total.ref_len, 1),
        "del_rate": total.dele / max(total.ref_len, 1),
        "sub_rate": total.sub / max(total.ref_len, 1),
        "wer_stdev": float(np.std(wers)) if wers else 0.0,
        "ref_words": total.ref_len,
    }
