"""ES-compatible text analysis chain, Spark-first.

Mirrors the reference's Elasticsearch analyzer (reference:
coordinator/coordinator/elasticsearch.yml:2-20): `html_strip` char
filter → `standard` tokenizer → `lowercase` → English stemmer, applied
identically at index and at query time.  The chain here is vendored and
pinned (BASELINE.json input_hint: byte-identical extracted text per
url; no library-version drift):

- ``extract_text``  — html_strip analog: drops <script>/<style>/
  comments, strips tags, decodes HTML entities.  Pure function of the
  bytes.
- ``tokenize``      — two profiles: ``uax29`` (Lucene `standard`
  fidelity, uax29.py, vector-pinned — the DEFAULT for the full
  stemming analyzer) and ``simple`` (unicode word regex ``\\w+`` —
  the DuckDB-mirrorable oracle profile; underscore joins, "3.14"
  splits).
- ``lowercase`` + ``porter2.stem``.

Two profiles:
- full (html_strip + uax29 + stem) — the engine's index analyzer;
  rank-identity (kernel vs DataFrame vs python oracle) is asserted
  under it in pytest.
- simple (lowercase + ``\\w+`` split, no stem) — shared with the
  DuckDB oracle, which cannot stem; used by the oracle-gated queries in
  ``__spark_entry__.py``.  Matches the reference's own only in-process
  term-frequency computation (lib_profiler core.py:54,445-451:
  ``split(lower(text), '\\W+')``).

``resolve_tokenizer(None, stemming)`` implements the default pairing;
both halves of every comparison must pass the same profile explicitly
to diverge from it.

All Spark entry points are Arrow-batched pandas UDFs / builtin
expressions — no per-row Python UDFs (north rule §2.10).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterable

import pandas as pd

from .porter2 import StemCache

# --- html_strip ------------------------------------------------------------

_RE_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_RE_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RE_TAG = re.compile(r"(?s)<[^>]*>")

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def resolve_tokenizer(tokenizer: str | None, stemming: bool) -> str:
    """Default pairing: the full (stemming) analyzer tokenizes with
    Lucene-fidelity ``uax29``; the oracle-facing non-stemming profile
    stays ``simple`` (the DuckDB oracle mirrors ``\\w+``)."""
    if tokenizer is not None:
        return tokenizer
    return "uax29" if stemming else "simple"


def extract_text_str(html_text: str) -> str:
    """html_strip char-filter analog over a decoded string."""
    s = _RE_SCRIPT.sub("", html_text)
    s = _RE_STYLE.sub("", s)
    s = _RE_COMMENT.sub("", s)
    s = _RE_TAG.sub("", s)
    if "&" in s:
        s = _html.unescape(s)
    return s


def extract_text_series(html_bytes: pd.Series) -> pd.Series:
    """Vectorized html(binary) → text for a pandas UDF batch."""
    s = html_bytes.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    return s.map(lambda t: extract_text_str(t) if t is not None else None)


# --- tokenize --------------------------------------------------------------


def analyze_str(
    text: str, stem_cache: StemCache | None = None, tokenizer: str = "simple"
) -> list[str]:
    """Full analysis chain for one string: tokenize → lowercase → stem.

    ``tokenizer``: "simple" = ``\\w+`` (default; DuckDB-mirrorable),
    "uax29" = Lucene `standard` fidelity (uax29.py, vector-pinned)."""
    if text is None:
        return []
    if tokenizer == "uax29":
        from .uax29 import tokenize_uax29

        toks = tokenize_uax29(text.lower())
    else:
        toks = _TOKEN_RE.findall(text.lower())
    if stem_cache is None:
        return toks
    return [stem_cache(t) for t in toks]


def analyze_series(
    texts: pd.Series, stemming: bool = True, tokenizer: str = "simple"
) -> pd.Series:
    """Batch analysis: Series[str] → Series[list[str]].

    pandas ``str.findall`` keeps the regex loop in C; stemming memoizes
    per batch (vocabulary ≪ token count, so hit-rate ≈ 100%).
    """
    if tokenizer == "uax29":
        from .uax29 import _MAYBE_SLOW, _NEEDS_SLOW, tokenize_uax29

        # vectorized fast path: documents without CJK/Extend/Format/
        # mid-joiner-between-word-chars segment identically under \w+
        # (uax29.py docstring).  Two-stage detection, both C-speed: a
        # cheap single-class scan eliminates most rows, the precise
        # lookaround scan runs only on its survivors, and the full
        # Python grammar only on rows that truly need it.
        low = texts.str.lower()
        toks = low.str.findall(_TOKEN_RE)
        maybe = low.str.contains(_MAYBE_SLOW, regex=True, na=False)
        if maybe.any():
            sub = low[maybe]
            slow = sub.str.contains(_NEEDS_SLOW, regex=True, na=False)
            if slow.any():
                toks = toks.copy()
                toks[slow[slow].index] = sub[slow].map(tokenize_uax29)
    else:
        toks = texts.str.lower().str.findall(_TOKEN_RE)
    if not stemming:
        return toks
    cache = StemCache()
    return toks.map(lambda ts: [cache(t) for t in ts] if ts is not None else None)


def analyze_query(
    query: str, stemming: bool = True, tokenizer: str = "simple"
) -> list[str]:
    """Query-time analysis — identical chain to index time (unique terms,
    order preserved; reference uses AND-semantics over distinct terms,
    apiserver/apiserver/search/__init__.py:67)."""
    toks = analyze_str(query, StemCache() if stemming else None, tokenizer=tokenizer)
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t, None)
    return list(seen)


def iter_analyze(texts: Iterable[str], stemming: bool = True) -> Iterable[list[str]]:
    cache = StemCache() if stemming else None
    for t in texts:
        yield analyze_str(t, cache)
