"""UAX#29 word segmentation — Lucene `standard` tokenizer fidelity.

The reference's analyzer chain is `html_strip → standard → lowercase →
english stemmer` (coordinator/coordinator/elasticsearch.yml:2-20); the
`standard` tokenizer is Lucene's UAX#29 word-boundary implementation.
The engine's default tokenizer is `\\w+` (analyzer.py — documented
deviation, chosen because the DuckDB oracle must mirror it); THIS
module is the `standard`-fidelity tokenizer, selectable with
``build_index(...)`` / queries via ``analyzer profile "uax29"`` and
pinned against Lucene-behavior vectors in tests/test_uax29.py.

Rules implemented (UAX#29 word-boundary, as Lucene StandardTokenizer
applies them):
- letter/digit runs form tokens; letters×digits join (WB9/WB10);
- underscore (ExtendNumLet) joins (WB13a/b);
- MidLetter {: ·} / MidNumLet {. '} / Single_Quote join LETTER pairs
  (WB6/WB7)  → "can't", "o'neil", "example.com", "a:b" are one token;
- MidNum {, ; .} / MidNumLet / Single_Quote join DIGIT pairs
  (WB11/WB12) → "3.14", "1,000,000" are one token;
- a separator between a letter and a digit never joins ("a.1" splits);
- Han and Hiragana are emitted as SINGLE-character tokens; Katakana as
  runs — exactly Lucene's StandardTokenizer grammar;
- everything else is a boundary.

Quarantined deviations (not implemented, listed so the gap is
explicit): Extend/Format characters inside words (ZWJ, combining marks
count as word chars via `\\w` instead of the Extend rule), regional
indicators (emoji flags), and Hebrew double-quote gershayim.  None of
these occur in the synthetic corpus; on real web text they affect a
vanishingly small token fraction.
"""

from __future__ import annotations

import re

_HAN = "㐀-䶿一-鿿豈-﫿"
_HIRA = "ぁ-ゟ"
_KATA = "゠-ヿㇰ-ㇿ"

# word char = \w minus underscore-is-fine, minus CJK classes handled apart
_WC = rf"(?:(?![{_HAN}{_HIRA}{_KATA}])\w)"
_MIDS = ".,:;'’·"
_COARSE = re.compile(
    rf"[{_KATA}]+"            # katakana run
    rf"|[{_HAN}]"             # han unigram
    rf"|[{_HIRA}]"            # hiragana unigram
    rf"|{_WC}+(?:[{_MIDS}]{_WC}+)*"  # word with candidate mid-joiners
)

_LETTER_MIDS = set(":·.'’")   # MidLetter ∪ MidNumLet ∪ Single_Quote
_DIGIT_MIDS = set(",;.'’")         # MidNum ∪ MidNumLet ∪ Single_Quote
_MID_SET = set(_MIDS)


def _split_invalid_mids(token: str) -> list[str]:
    """Validate every mid-joiner: keep it only between two letters (with
    a letter-mid) or two digits (with a digit-mid); split otherwise."""
    out: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(token)
    while i < n:
        ch = token[i]
        if ch in _MID_SET:
            prev = token[i - 1]
            nxt = token[i + 1]  # coarse regex guarantees word chars around
            ok = (
                (prev.isalpha() and nxt.isalpha() and ch in _LETTER_MIDS)
                or (prev.isdigit() and nxt.isdigit() and ch in _DIGIT_MIDS)
            )
            if ok:
                cur.append(ch)
            else:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


def tokenize_uax29(text: str) -> list[str]:
    """UAX#29 word segmentation of one string (no case folding)."""
    if not text:
        return []
    toks: list[str] = []
    for m in _COARSE.findall(text):
        if any(c in _MID_SET for c in m):
            toks.extend(_split_invalid_mids(m))
        else:
            toks.append(m)
    return toks
