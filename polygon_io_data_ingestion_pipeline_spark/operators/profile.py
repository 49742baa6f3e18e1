"""Data profiling and constraint checking — the ingestion-quality
primitives every production lake runs before and after a load (the
reference validates frames ad hoc inside its notebooks; here the checks
are first-class operators with a uniform report schema).

Scale notes:

- :func:`profile_columns` default mode is ONE pass over the table with
  ``approx_count_distinct`` per column (HLL sketches merge map-side,
  so the pass is a plain partial aggregation — the only shape that
  profiles 100 TB). ``exact=True`` runs one column-pruned aggregation
  per column instead and unions the one-row results: N cheap scans
  beat one scan with Spark's Expand-based multi-distinct (which
  multiplies every row by the number of distinct aggregates).
- :func:`check_constraints` is one partial aggregation for all
  row-level rules at once (a conditional sum per rule). Key-uniqueness
  and referential checks need their own shuffles by nature (groupBy /
  anti join on the key) but report through the same schema.

Report schema everywhere: (check, n_violations, passed) — a dashboard
or a CI gate consumes one shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bq(name: str) -> str:
    """Backtick-quote an identifier for embedding in a SQL expression."""
    return "`" + name.replace("`", "``") + "`"


def _sq(s: str) -> str:
    """Escape a string for embedding as a single-quoted SQL literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def profile_columns(df: DataFrame, cols: list[str], exact: bool = False) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings so the
    report schema is uniform across column types.

    ``exact=False`` (default): one pass, HLL distinct estimates —
    the 100 TB mode. ``exact=True``: one column-pruned aggregation per
    column, unioned — exact counts for audit/oracle use."""
    if exact:
        parts = [
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_value"),
                F.max(F.col(c)).cast("string").alias("max_value"),
            ).select(
                F.lit(c).alias("column"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
            for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    # Backtick-quote generated aliases and escape the label literal:
    # a column name with a space/dash/quote is otherwise parsed as SQL
    # by the map expression and crashes the report.
    stacked = ", ".join(
        f"'{_sq(c)}', struct({_bq('__nn_' + c)} AS n_nulls, {_bq('__nd_' + c)} AS n_distinct, "
        f"{_bq('__mn_' + c)} AS min_value, {_bq('__mx_' + c)} AS max_value)"
        for c in cols
    )
    return one.select(
        F.expr(f"explode(map({stacked}))").alias("column", "s"), "n_rows"
    ).select("column", "n_rows", "s.n_nulls", "s.n_distinct", "s.min_value", "s.max_value")


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Row-level rule report in ONE aggregation pass: each rule is a
    boolean Column that valid rows satisfy; the report counts the
    violators. (check, n_violations, passed)."""
    aggs = [
        F.sum((~cond | cond.isNull()).cast("long")).alias(name)
        for name, cond in rules.items()
    ]
    one = df.agg(*aggs)
    # Rule names are free text ("price > 0"): quote the identifier
    # reference and escape the label literal or the map expression
    # parses the name as SQL.
    stacked = ", ".join(f"'{_sq(name)}', {_bq(name)}" for name in rules)
    out = one.select(F.expr(f"explode(map({stacked}))").alias("check", "n_violations"))
    return out.select(
        "check", "n_violations", (F.col("n_violations") == 0).cast("int").alias("passed")
    )


def check_unique(df: DataFrame, key_cols: list[str], name: str | None = None) -> DataFrame:
    """Key-uniqueness report: n_violations = rows beyond the first in
    any duplicate key group (groupBy on the key — the required shuffle)."""
    label = name or ("unique_" + "_".join(key_cols))
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations"))
    )
    return dups.select(
        F.lit(label).alias("check"),
        F.col("n_violations").cast("long"),
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def check_foreign_key(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity report: child keys with no parent (left
    anti join on the key; broadcast when the parent is a dimension)."""
    label = name or f"fk_{child_key}"
    orphans = (
        child.join(parent, child[child_key] == parent[parent_key], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return orphans.select(
        F.lit(label).alias("check"),
        F.col("n_violations").cast("long"),
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-check reports into one (check, n_violations, passed)
    frame — the artifact a load either publishes or fails on."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
