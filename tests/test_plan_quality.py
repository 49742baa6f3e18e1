"""Physical-plan assertions: the optimizations SURVEY §4 claims are
"built-in" must actually show up in the plans — pushed filters, pruned
schemas, broadcast joins, no Python UDFs in JVM-only pipelines.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.plans.lint import (
    assert_scalable,
    lint_plan,
    plan_text,
)
from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY
from polygon_io_data_ingestion_pipeline_spark.sources import table


def plan_of(df) -> str:
    return plan_text(df)


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = REGISTRY["filter_project_pushdown"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    # quantity predicate is pushable; shipdate range too
    assert "GreaterThan(l_quantity" in plan
    assert "IsNotNull(l_shipdate)" in plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(REGISTRY["tpch_q05_local_supplier_volume"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    plan10 = plan_of(REGISTRY["tpch_q10_returned_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan10


def test_no_python_udfs_in_jvm_pipelines(spark, sf_dir):
    """Everything except the explicitly Arrow-batched operators must stay
    JVM-side: no BatchEvalPython / ArrowEvalPython stages.

    Declared Arrow lanes (the only sanctioned Python): media decode
    rides mapInPandas (a different plan node, not matched here), and
    dedup_nfc_collapse_classes runs text.unicode_normalized — a scalar
    Pandas UDF because Spark has no native Unicode-normalizer
    expression (round 13); it is map-side, shuffle-free, and the query
    exists precisely to externally anchor that lane.  Row-at-a-time
    BatchEvalPython stays banned everywhere."""
    arrow_declared = {"dedup_nfc_collapse_classes"}
    offenders = []
    for name, spec in REGISTRY.items():
        plan = plan_of(spec.fn(spark, sf_dir))
        if "BatchEvalPython" in plan:
            offenders.append(name)
        elif "ArrowEvalPython" in plan and name not in arrow_declared:
            offenders.append(name)
    assert not offenders, f"Python in the hot path: {offenders}"


def test_registry_passes_the_plan_linter(spark, sf_dir):
    """Every registry query clears the packaged lint gate: no
    error-class scale-killer (row-Python, cartesian, nested-loop) in
    any plan. The linter IS the per-query mechanism; this keeps the
    library check and the test suite from drifting apart.

    Acknowledged suppressions — both the same shape: a filter against a
    broadcast 1-ROW aggregate that Catalyst fuses into the nested-loop
    join's condition, which the linter cannot tell apart from a real
    range join (cardinality is not in the plan text).  Per-pair cost
    with |build| = 1 is linear — fine.  tpch_q22: the global-average
    balance threshold.  docs_trust_selection: personalized_pagerank's
    seed-count (ns) and dangling-mass (dang) one-row broadcasts, whose
    downstream ``trust > 0`` contribution filter fuses the same way."""
    allowed = {
        "tpch_q22_idle_balance": ("nested-loop-join",),
        "docs_trust_selection": ("nested-loop-join",),
    }
    for name, spec in REGISTRY.items():
        assert_scalable(spec.fn(spark, sf_dir), allow=allowed.get(name, ()))


def test_linter_catches_planted_scale_killers(spark, sf_dir):
    """The linter must actually fire on the shapes it claims to catch."""
    import pytest
    from pyspark.sql import functions as F

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    # Pure inequality join -> BroadcastNestedLoopJoin.
    bad_join = c.join(o, c.c_acctbal < o.o_totalprice)
    rules = {f.rule for f in lint_plan(bad_join)}
    assert "nested-loop-join" in rules or "cartesian-product" in rules
    with pytest.raises(AssertionError, match="scale-killer"):
        assert_scalable(bad_join)

    # Row-at-a-time Python UDF -> BatchEvalPython.
    from pyspark.sql.types import LongType

    plus = F.udf(lambda x: x + 1, LongType())
    bad_udf = c.select(plus("c_custkey").alias("k"))
    assert {f.rule for f in lint_plan(bad_udf)} >= {"python-row-udf"}

    # Un-partitioned window -> single-partition exchange (warn only).
    from pyspark.sql import Window

    w = Window.orderBy("c_custkey")
    global_win = c.select(F.row_number().over(w).alias("rn"))
    findings = assert_scalable(global_win)  # warns must NOT raise
    assert "single-partition-exchange" in {f.rule for f in findings}


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(REGISTRY["topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_pair_generators_have_no_cartesian(spark, sf_dir):
    """The near-dup pair queries must generate candidates via equi
    hash joins (pigeonhole chunks / LSH buckets / prefix index) — a
    cartesian or nested-loop join means the quadratic path came back."""
    for name in (
        "dedup_simhash_pairs",
        "emb_cosine_neardup_pairs",
        "dedup_ngram_jaccard_pairs",
        "dedup_minhash_lsh_candidates",
    ):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_simhash_pigeonhole_equals_allpairs(spark, sf_dir):
    """The banded pigeonhole join returns exactly the all-pairs set."""
    from polygon_io_data_ingestion_pipeline_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    fast = D.simhash_pairs(docs, max_hamming=4)
    slow = D.simhash_pairs_allpairs(docs, max_hamming=4)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_jaccard_prefix_filter_is_lossless(spark, sf_dir):
    """Prefix-filtered candidates reproduce the full exact pair set
    (threshold chosen so prefixes are strictly shorter than the sets)."""
    from polygon_io_data_ingestion_pipeline_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    got = {
        (r.id1, r.id2): r.jaccard
        for r in D.jaccard_pairs(docs, threshold=0.04, strategy="prefix").collect()
    }
    sh = D.shingle_set(docs)
    a = sh.selectExpr("doc_id AS id1", "shingle AS s")
    b = sh.selectExpr("doc_id AS id2", "shingle AS s")
    sizes = sh.groupBy("doc_id").count()
    inter = (
        a.join(b, "s")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .count()
        .withColumnRenamed("count", "inter")
    )
    expect = {}
    n_by_id = {r[0]: r[1] for r in sizes.collect()}
    for r in inter.collect():
        j = r.inter / (n_by_id[r.id1] + n_by_id[r.id2] - r.inter)
        if j >= 0.04:
            expect[(r.id1, r.id2)] = round(j, 6)
    assert got == expect


def test_whole_stage_codegen_active(spark, sf_dir):
    df = REGISTRY["tpch_q01_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # `*(n)` prefixes mark whole-stage-codegen spans in the tree string
    assert "*(" in plan


def test_map_side_operators_have_no_exchange(spark, sf_dir):
    """Chunking and PII scrubbing are pure map-side column expressions:
    any Exchange in their plans means a shuffle crept into what should
    run at scan speed."""
    for name in ("docs_chunk_windows", "customers_pii_scrub"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_shared_substring_pairs_no_cartesian(spark, sf_dir):
    """The winnow posting self-join must stay an equi hash join on the
    fingerprint key."""
    plan = plan_of(REGISTRY["docs_shared_substring_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_ngram_fraction_single_corpus_pass(spark, sf_dir):
    """Round-13 shape: per-document shingle totals come from the ONE
    materialized posting table (shingle_set is per-doc distinct, so
    count(*) per id IS the distinct-shingle total) — the query must NOT
    rescan the corpus for a second array_distinct pass, whose filter
    pushdown additionally duplicated the dominant shingle transform
    into the scan (measured 3.7s -> 1.9s at sf0.1). The frequent-set
    membership stays an equi join."""
    plan = plan_of(REGISTRY["docs_dup_ngram_fraction"].fn(spark, sf_dir))
    # the only array_distinct is inside the checkpointed shingle_set
    # lineage, which is materialized before this plan: the final plan
    # reads ExistingRDD scans, not a second parquet scan of documents
    assert "array_distinct" not in plan
    assert plan.count("Scan parquet") == 0
    assert "CartesianProduct" not in plan


def test_no_unbounded_driver_collects():
    """Every ``.collect()`` in the package must be bounded: an aggregate /
    distinct / limit chain, the capped training-sample helper, or an
    explicit ``# bounded:`` annotation stating why the row count is
    O(metadata).  This is the round-5 verdict's codebook-training defect,
    enforced mechanically so it cannot recur anywhere."""
    from pathlib import Path

    import polygon_io_data_ingestion_pipeline_spark as pkg

    tokens = (
        ".distinct()",
        ".groupBy(",
        ".agg(",
        ".limit(",
        "_bounded_train_sample",
        "# bounded:",
    )
    offenders = []
    for py in sorted(Path(pkg.__file__).parent.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if ".collect()" not in line:
                continue
            ctx = "\n".join(lines[max(0, i - 8) : i + 1])
            if not any(t in ctx for t in tokens):
                offenders.append(f"{py.name}:{i + 1}")
    assert not offenders, f"unbounded driver collect() at: {offenders}"


def test_no_inplace_dataframe_schema_mutation():
    """``df.schema`` returns the plan's CACHED StructType and
    ``StructType.add`` mutates self, so ``df.schema.add(...)`` silently
    corrupts the DataFrame's own schema object.  Derived schemas must be
    built from a copy (``StructType(list(df.schema.fields)).add(...)``).
    Round-8 advice finding, enforced mechanically."""
    import re
    from pathlib import Path

    import polygon_io_data_ingestion_pipeline_spark as pkg

    pat = re.compile(r"\.schema\s*\.add\(")
    offenders = [
        f"{py.name}:{i + 1}"
        for py in sorted(Path(pkg.__file__).parent.rglob("*.py"))
        for i, line in enumerate(py.read_text().splitlines())
        if pat.search(line)
    ]
    assert not offenders, f"in-place df.schema.add() at: {offenders}"


def _tree(df) -> str:
    # the executed-plan tree (one line per node) — plan_text's formatted
    # details section repeats node names, which breaks counting
    return df._jdf.queryExecution().executedPlan().toString()


def test_q08_joins_broadcast_with_one_shuffle(spark, sf_dir):
    """The widest join in the registry must stay dimension-broadcast: no
    sort-merge joins, and exactly ONE hash exchange (the final grouped
    aggregation) at test scale."""
    t = _tree(REGISTRY["tpch_q08_market_share"].fn(spark, sf_dir))
    assert t.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in t
    assert t.count("Exchange hashpartitioning") == 1


def test_shuffle_shards_is_one_shuffle(spark, sf_dir):
    """The corpus shuffle's whole point: shard assignment is map-side and
    the per-shard ordering is the ONLY exchange."""
    t = _tree(REGISTRY["docs_shuffle_shards"].fn(spark, sf_dir))
    assert t.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in t  # no global sort, ever


def test_scd2_collapse_reuses_the_window_partitioning(spark, sf_dir):
    """The run-collapse groupBy(key, run) must NOT re-shuffle: hash
    partitioning on the key already satisfies the grouping — one
    exchange for the whole gaps-and-islands chain."""
    t = _tree(REGISTRY["events_value_tier_scd2"].fn(spark, sf_dir))
    assert t.count("Exchange hashpartitioning") == 1
