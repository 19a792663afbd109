"""Join/union *discovery* scoring — which datasets can augment an input.

Ports the reference's discovery algebra (SURVEY.md §2.6):
- R6 union similarity: column pairs scored by Levenshtein similarity
  (1 − dist/max_len, or 1.0 on substring containment) on lowercased
  names (apiserver/apiserver/search/union.py:13-22);
- W3 greedy best-pair matching: pairs sorted by similarity desc,
  greedily kept if both endpoints unused — a maximal-matching
  approximation (union.py:164-181);
- dataset union score = (Σ pair sims / n_input_columns) × max ES score,
  datasets with ≤1 matched pair dropped (union.py:177-190);
- J8 containment: |A ∩ B| / |A| over column value sets — the Lazo
  sketch's exact form (reference delegates to the external Lazo server,
  search/join.py:334-425; at 100 TB swap the exact distinct-join for a
  MinHash signature comparison, same interface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def name_similarity(a: str, b: str) -> float:
    """union.py:13-22: 1.0 if one lowercased name contains the other,
    else 1 − levenshtein/max_len."""
    la, lb = a.lower(), b.lower()
    if la in lb or lb in la:
        return 1.0
    # iterative Levenshtein
    prev = list(range(len(lb) + 1))
    for i, ca in enumerate(la, 1):
        cur = [i]
        for j, cb in enumerate(lb, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return 1.0 - prev[-1] / max(len(la), len(lb))


def greedy_pair_matching(
    pairs: list[tuple[str, str, float]], threshold: float = 0.0
) -> list[tuple[str, str, float]]:
    """W3: sort by similarity desc, keep pairs whose endpoints are both
    unseen (union.py:164-181).  Deterministic tie order (sim desc,
    left asc, right asc)."""
    used_l: set[str] = set()
    used_r: set[str] = set()
    out = []
    for l, r, s in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if s <= threshold:
            continue
        if l in used_l or r in used_r:
            continue
        used_l.add(l)
        used_r.add(r)
        out.append((l, r, s))
    return out


def union_candidate_score(
    input_columns: list[str],
    candidate_columns: list[str],
    es_score: float = 1.0,
) -> tuple[float, list[tuple[str, str, float]]]:
    """Full R6/W3 pipeline for one candidate dataset: all-pairs name
    similarity → greedy matching → (Σ sims / n_input) × es_score;
    score 0.0 if ≤1 pair matched (union.py:177-190)."""
    pairs = [
        (a, b, name_similarity(a, b)) for a in input_columns for b in candidate_columns
    ]
    matched = greedy_pair_matching(pairs)
    if len(matched) <= 1:
        return 0.0, matched
    score = sum(s for _, _, s in matched) / len(input_columns) * es_score
    return score, matched


def containment_score(
    left: DataFrame, left_col: str, right: DataFrame, right_col: str
) -> float:
    """J8 exact containment |L ∩ R| / |L| over distinct values.
    Distributed: two distinct-aggregations + one broadcast-able
    semi-join — no driver-side value sets."""
    l = left.select(F.col(left_col).cast("string").alias("v")).where(
        F.col("v").isNotNull()
    ).distinct()
    r = right.select(F.col(right_col).cast("string").alias("v")).where(
        F.col("v").isNotNull()
    ).distinct()
    n_l = l.count()
    if n_l == 0:
        return 0.0
    inter = l.join(r, "v", "left_semi").count()
    return inter / n_l


def unpivot_wide_years(
    df: DataFrame, id_cols: list[str], value_cols: list[str],
    var_name: str = "date", value_name: str = "value",
) -> DataFrame:
    """S10: wide date-named columns → long rows (lib_materialize/
    pivot.py:10-38 melts when ≥80% of ≥3 column names parse as dates).
    Spark-native ``melt``/``unpivot``."""
    return df.unpivot(id_cols, value_cols, var_name, value_name)
