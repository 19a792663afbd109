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
