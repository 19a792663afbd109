"""Pinned Lucene `standard` tokenizer (UAX#29) behavior vectors.

Each case is the output Lucene's StandardTokenizer produces for the
input (UAX#29 word boundaries; Han/Hiragana unigrams, Katakana runs) —
the reference's index-time tokenizer (elasticsearch.yml:2-20).
"""

import pytest

from datamart_spark.uax29 import tokenize_uax29

VECTORS = [
    # plain ASCII + punctuation boundaries
    ("The quick-brown fox.", ["The", "quick", "brown", "fox"]),
    ("hello   world", ["hello", "world"]),
    ("", []),
    ("!!! ...", []),
    # numerics: MidNum/MidNumLet join digit pairs
    ("3.14", ["3.14"]),
    ("1,000,000", ["1,000,000"]),
    ("3.14.15", ["3.14.15"]),
    ("v1.0", ["v1.0"]),
    ("100%", ["100"]),
    # apostrophes (Single_Quote) join letters
    ("can't stop", ["can't", "stop"]),
    ("O'Neil's", ["O'Neil's"]),
    ("'quoted'", ["quoted"]),
    # MidLetter colon / MidNumLet dot join letters
    ("a:b", ["a:b"]),
    ("example.com", ["example.com"]),
    ("john@example.com", ["john", "example.com"]),
    ("end.", ["end"]),
    # mid chars do NOT join across letter/digit class boundaries
    ("a.1", ["a", "1"]),
    ("a,b", ["a", "b"]),
    # '&' and '-' are plain boundaries
    ("R&D", ["R", "D"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    # ExtendNumLet underscore joins; letters×digits join
    ("foo_bar", ["foo_bar"]),
    ("abc123", ["abc123"]),
    ("100km", ["100km"]),
    # accents are word chars
    ("café über naïve", ["café", "über", "naïve"]),
    # CJK: Han + Hiragana unigrams, Katakana runs
    ("日本語", ["日", "本", "語"]),
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("カタカナ", ["カタカナ"]),
    ("中文abc", ["中", "文", "abc"]),
    # WB7b/WB7c gershayim: double quote joins a HEBREW letter pair only
    ('צה"ל', ['צה"ל']),
    ('מנכ״ל', ['מנכ״ל']),      # U+05F4 gershayim (MidLetter)
    ('a"b', ["a", "b"]),
    ('3"4', ["3", "4"]),
    ('say "hello" now', ["say", "hello", "now"]),
    ('א"', ["א"]),             # trailing DQ never attaches
    # WB7a geresh: single quote AFTER a Hebrew letter stays attached
    ("א'", ["א'"]),
    ("ג'ון אמר", ["ג'ון", "אמר"]),
    ("abc' def", ["abc", "def"]),  # Latin trailing quote still drops
    # WB4 transparency inside WB7a (ADVICE r4): a combining point
    # between the Hebrew letter and the geresh quote must not defeat it
    ("אִ'", ["אִ'"]),          # hiriq (Mn) before the quote
    ("רְִ' ב", ["רְִ'", "ב"]),  # Extend RUN (len 2)
    ("ś' t", ["ś", "t"]),    # non-Hebrew base: still drops
    # WB15/WB16: regional indicators pair from the left
    ("\U0001f1fa\U0001f1f8", ["\U0001f1fa\U0001f1f8"]),
    ("\U0001f1fa\U0001f1f8\U0001f1eb\U0001f1f7",
     ["\U0001f1fa\U0001f1f8", "\U0001f1eb\U0001f1f7"]),
    ("\U0001f1fa\U0001f1f8\U0001f1eb\U0001f1f7\U0001f1e9",
     ["\U0001f1fa\U0001f1f8", "\U0001f1eb\U0001f1f7", "\U0001f1e9"]),
    ("hi \U0001f1e9\U0001f1ea there", ["hi", "\U0001f1e9\U0001f1ea", "there"]),
    # supplementary-plane WB4: emoji skin-tone modifier (WB Extend),
    # variation-selector supplement (Mn) are transparent and retained
    ("hi\U0001f3fbthere", ["hi\U0001f3fbthere"]),
    ("a\U000e0101b", ["a\U000e0101b"]),
    ("x \U0001d165 y", ["x", "y"]),  # lone SMP combining mark: no token
    # CJK extension B: unigrams like the BMP ideographs
    ("abc\U00020000\U00020001def", ["abc", "\U00020000", "\U00020001", "def"]),
    # U+05F3 HEBREW PUNCTUATION GERESH is ALetter: part of the word
    ("ג\u05f3ינס", ["ג\u05f3ינס"]),
    ("ד\u05f3ר כהן", ["ד\u05f3ר", "כהן"]),
    # Extended_Pictographic emoji are tokens (Lucene <EMOJI>)
    ("I \u2764 you", ["I", "\u2764", "you"]),
    ("I \u2764\ufe0f you", ["I", "\u2764\ufe0f", "you"]),  # VS16 attached
    ("\U0001f44d\U0001f3fd ok", ["\U0001f44d\U0001f3fd", "ok"]),  # skin tone
    ("\U0001f642\U0001f642", ["\U0001f642", "\U0001f642"]),  # no ZWJ: two
    # WB3c: ZWJ-joined sequence is ONE token (woman technologist)
    ("\U0001f469\u200d\U0001f4bb code", ["\U0001f469\u200d\U0001f4bb", "code"]),
    # family: EP ZWJ EP ZWJ EP stays whole
    ("\U0001f468\u200d\U0001f469\u200d\U0001f466",
     ["\U0001f468\u200d\U0001f469\u200d\U0001f466"]),
    # emoji adjacent to words and flags
    ("hi\U0001f680there", ["hi", "\U0001f680", "there"]),
    ("\U0001f1e9\U0001f1ea\U0001f37a",
     ["\U0001f1e9\U0001f1ea", "\U0001f37a"]),
]


@pytest.mark.parametrize("text,want", VECTORS)
def test_uax29_vectors(text, want):
    assert tokenize_uax29(text) == want


def test_divergence_from_default_analyzer_documented():
    """The default `\\w+` tokenizer differs from `standard` exactly where
    the analyzer docstring says it does — pin two canonical examples so
    the deviation stays visible."""
    from datamart_spark.analyzer import analyze_str

    # "3.14" : standard keeps it whole, \w+ splits
    assert tokenize_uax29("3.14") == ["3.14"]
    assert analyze_str("3.14") == ["3", "14"]
    # "can't" : standard joins, \w+ splits
    assert tokenize_uax29("can't") == ["can't"]
    assert analyze_str("can't") == ["can", "t"]


EXTEND_VECTORS = [
    # WB4: combining marks are transparent and stay in the token
    ("café latte", ["café", "latte"]),
    # format chars (Cf): soft hyphen / ZWNJ / ZWJ never split a word
    ("exam­ple", ["exam­ple"]),
    ("ni‌m", ["ni‌m"]),
    ("ab‍cd", ["ab‍cd"]),
    # mid-joiner validation looks THROUGH extend chars on both sides
    ("á.b", ["á.b"]),
    ("3́.1", ["3́.1"]),
    ("á.1", ["á", "1"]),  # letter.digit still splits
    # leading extend attaches to the preceding boundary → dropped
    ("́abc", ["abc"]),
    # a lone extend/format run emits no token
    ("́‍", []),
    # CJK unigrams absorb trailing marks
    ("例え́ば", ["例", "え́", "ば"]),
]


@pytest.mark.parametrize("text,want", EXTEND_VECTORS)
def test_uax29_extend_format(text, want):
    assert tokenize_uax29(text) == want


def test_uax29_is_default_for_full_analyzer(spark, tmp_path):
    """The full (stemming) analyzer now defaults to the uax29 profile:
    an index built with defaults records tokenizer=uax29 in its
    snapshot, queries analyze with it, and rank identity holds against
    the python oracle under the same profile (VERDICT r2 #7)."""
    from datamart_spark.corpus import generate_documents, generate_documents_pandas
    from datamart_spark.index import IndexCatalog, build_index
    from datamart_spark.query import bm25_topk_blockmax
    from datamart_spark.query.bm25_oracle import Bm25Oracle

    cat = IndexCatalog(str(tmp_path / "uaxdef"))
    m = build_index(generate_documents(spark, 250), cat, resume=False)
    assert m["tokenizer"] == "uax29"
    oracle = Bm25Oracle(
        generate_documents_pandas(250)[["doc_id", "text", "lang", "warc_ts"]]
    )
    assert oracle.tokenizer == "uax29"
    from datamart_spark.corpus import _VOCAB
    q = f"{_VOCAB[40]} {_VOCAB[300]}"
    got = [(r["doc_id"], round(r["score"], 9))
           for r in bm25_topk_blockmax(spark, cat, q, k=10).collect()]
    want = [(d, round(s, 9)) for d, s in oracle.topk(q, k=10)]
    assert got == want and len(got) > 0
    # resuming the same catalog with default args inherits the profile
    m2 = build_index(generate_documents(spark, 250), cat)
    assert m2["tokenizer"] == "uax29"
