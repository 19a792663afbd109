"""Analyzer-chain unit tests: tokenizer vectors, stemmer vectors,
html_strip behavior (reference analyzer: elasticsearch.yml:2-20)."""

from datamart_spark.analyzer import analyze_query, analyze_str, extract_text_str
from datamart_spark.porter2 import StemCache, stem


def test_stemmer_vectors():
    vectors = {
        "running": "run",
        "consignment": "consign",
        "queries": "queri",
        "query": "queri",
        "abilities": "abil",
        "national": "nation",
        "relational": "relat",
        "generously": "generous",
        "hopefulness": "hope",
        "dying": "die",
        "news": "news",
        "skies": "sky",
        "exceed": "exceed",
        "communities": "communiti",
        "indexing": "index",
        "scores": "score",
        "hopping": "hop",
        "filing": "file",
        "the": "the",
        "a": "a",
    }
    for w, s in vectors.items():
        assert stem(w) == s, (w, stem(w), s)


def test_stem_cache_consistent():
    c = StemCache()
    assert c("running") == "run"
    assert c("running") == "run"


def test_tokenizer():
    assert analyze_str("Hello, World! 42x foo_bar", None) == [
        "hello", "world", "42x", "foo_bar",
    ]
    assert analyze_str("café über", None) == ["café", "über"]
    assert analyze_str("", None) == []
    assert analyze_str(None) == []


def test_analyze_full_chain():
    assert analyze_str("Running QUERIES quickly", StemCache()) == ["run", "queri", "quick"]


def test_analyze_query_dedups_preserving_order():
    assert analyze_query("runs running jumps", stemming=True) == ["run", "jump"]
    assert analyze_query("b a b", stemming=False) == ["b", "a"]


def test_extract_text_strips_tags_scripts_entities():
    html = (
        "<html><head><title>T&amp;A</title><style>p{color:red}</style></head>"
        "<body><p>hi <b>there</b></p><script>var x=1;</script>"
        "<!-- comment -->done</body></html>"
    )
    assert extract_text_str(html) == "T&Ahi theredone"


def test_extract_text_multiline_script():
    html = "<body>a<script type='x'>\nline1\nline2\n</script>b</body>"
    assert extract_text_str(html) == "ab"
