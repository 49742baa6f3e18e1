"""Fuzzy record linkage: deletion-neighborhood blocking (the SymSpell
technique) with exact edit-distance verification.

Entity resolution at corpus scale cannot compare all pairs; the
standard fix is blocking. Naive blocks (prefix, length, phonetic key)
trade recall for speed with no guarantee. The deletion neighborhood is
the lossless alternative for small distance bounds: two strings within
Levenshtein distance ``d`` ALWAYS share a member of their
``<= d``-deletion neighborhoods (delete the edited positions from
both), so an equi join on deletion variants captures every true pair —
recall 1.0 by construction — and the exact ``levenshtein`` filter then
removes false candidates.

Scale shape: variant generation is map-side (one array expression per
row, ~``len * d`` variants); the candidate pass is one equi join on the
variant key (linear shuffle, AQE splits hot variants); pairs dedupe in
one keyed aggregation before the (cheap, integer, engine-exact)
edit-distance verify. Nothing quadratic, nothing driver-side.

Edit distances are integers, so a DuckDB oracle reproduces the result
exactly — no float discipline needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(name_col: str, max_dist: int = 1) -> Column:
    """array<string>: the string plus every string reachable by deleting
    up to ``max_dist`` characters (the SymSpell index key set). One
    compact expression — generation is pure map-side codegen input."""
    if max_dist not in (1, 2):
        raise ValueError("deletion-neighborhood blocking supports max_dist 1 or 2")
    one = (
        f"transform(sequence(1, length({name_col})), i -> "
        f"  concat(substring({name_col}, 1, i - 1), substring({name_col}, i + 1)))"
    )
    expr = f"array_distinct(concat(array({name_col}), {one}))"
    if max_dist == 2:
        expr = (
            f"array_distinct(concat(array({name_col}), {one}, "
            f"  flatten(transform({one}, v -> "
            f"    transform(sequence(1, length(v)), i -> "
            f"      concat(substring(v, 1, i - 1), substring(v, i + 1)))))))"
        )
    return F.expr(expr)


def fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id1 < id2) whose names are within Levenshtein
    ``max_dist``: deletion-variant equi join for candidates (lossless —
    see module docstring), one distinct to dedupe pairs sharing several
    variants, then the exact integer edit-distance filter.

    Returns (id1, id2, dist)."""
    v = df.select(
        F.col(id_col), F.col(name_col), F.explode(deletion_variants(name_col, max_dist)).alias("var")
    )
    # Both self-join sides consume the variant explode (~len*d rows per
    # record, the dominant map-side cost); materialize it once — the
    # same no-cross-branch-CSE discipline as the dedup posting tables.
    v = v.localCheckpoint()
    a = v.select(F.col(id_col).alias("id1"), F.col(name_col).alias("n1"), "var")
    b = v.select(F.col(id_col).alias("id2"), F.col(name_col).alias("n2"), "var")
    cand = (
        a.join(b, "var")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "n1", "n2")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("n1", "n2").cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("id1", "id2", "dist")
    )


def link_best_match(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    left_id: str,
    right_id: str,
    max_dist: int = 2,
) -> DataFrame:
    """Link each left record to its single best fuzzy match on the
    right (lowest edit distance; ties -> lowest right id): the
    dirty-source-to-master-table join of record linkage. Same lossless
    blocking, then a per-left-id min-struct aggregation — no window
    sort, one keyed agg. Left rows with no candidate within
    ``max_dist`` are absent from the output (no match)."""
    lv = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_name).alias("__lname"),
        F.explode(deletion_variants(left_name, max_dist)).alias("var"),
    )
    rv = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_name).alias("__rname"),
        F.explode(deletion_variants(right_name, max_dist)).alias("var"),
    )
    cand = (
        lv.join(rv, "var")
        .select("__lid", "__lname", "__rid", "__rname")
        .distinct()
        .withColumn("dist", F.levenshtein("__lname", "__rname").cast("int"))
        .filter(F.col("dist") <= max_dist)
    )
    # Two consumers below (the best-match aggregate and the final
    # join): materialize the verified candidates once so the whole
    # explode-join-distinct-levenshtein stage does not run twice.
    cand = cand.localCheckpoint()
    best = cand.groupBy("__lid").agg(
        F.min(F.struct("dist", "__rid")).alias("__best")
    )
    return (
        cand.join(best, "__lid")
        .filter(
            (F.col("dist") == F.col("__best.dist"))
            & (F.col("__rid") == F.col("__best.__rid"))
        )
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__lname").alias(left_name),
            F.col("__rname").alias(right_name),
            "dist",
        )
    )
