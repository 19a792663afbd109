"""The driver's correctness gate checks only the FIRST 50 registry
entries.  Any entry that is the SOLE driver-facing gate for a SURVEY §2
operator must therefore sit inside that window; only the designated
redundant variants (each double-covered by a sibling) may trail.
"""

from datamart_spark.suite import ORACLE, REGISTRY, _TAIL

DRIVER_CAP = 50

# Entries that were structurally un-gated in rounds 1-4 (always at
# positions 51-55) and are each the ONLY oracle gate for their operator:
# spatial family (P5/J3/J7/R3), keyset pagination (W5), numeric profile.
SOLE_GATES = [
    "spatial_bbox_filter",
    "spatial_nn_join_grid",
    "spatial_overlap_boxes",
    "keyset_pagination",
    "numeric_profile_lineitem",
    "admin_area_profile",  # §1.2 AdministrativeArea rule (round 5)
    "bm25_phrase_indexed",  # positional postings + phrase kernel (round 6)
    "bm25_phrase_prefix",  # term-set (MultiPhraseQuery) kernel + prefix expansion (round 6)
    "phrase_spans",  # occurrence/offset extraction over positions (round 6)
    "bm25_phrase_slop",  # ordered-proximity greedy chain kernel (round 6)
    "phrase_passages",  # context-window passage extraction (round 6)
]


def test_sole_gate_entries_inside_driver_window():
    head = list(REGISTRY)[:DRIVER_CAP]
    missing = [n for n in SOLE_GATES if n not in head]
    assert not missing, f"un-gated sole-coverage entries: {missing}"


def test_only_designated_redundant_entries_trail():
    tail = list(REGISTRY)[DRIVER_CAP:]
    assert set(tail) <= set(_TAIL), tail


def test_oracle_covers_registry():
    assert set(ORACLE) == set(REGISTRY)
    # dict order must agree too: the driver zips them positionally
    assert list(ORACLE) == [n for n in REGISTRY if n in ORACLE]
