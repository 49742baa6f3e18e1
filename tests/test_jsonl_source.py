"""JSONL corpus source: roundtrip fidelity (plain + gzip), malformed-line
quarantine, projection pushdown into the JSON parser, and re-shard-on-write
for gzip read parallelism."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.sources import table
from polygon_io_data_ingestion_pipeline_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
)


def test_roundtrip_gzip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, target_partitions=4)
    files = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(files) == 4  # re-shard honored; gzip suffix present
    good, bad = read_jsonl(spark, out)
    assert bad.count() == 0
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(good.collect(), key=lambda r: r["doc_id"])
    assert a == b


def test_malformed_lines_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "fine", "lang": "en", "source": "s", "n_chars": 4}),
        '{"doc_id": "not-a-number", "text": "bad type"}',
    ]
    (p / "a.jsonl").write_text("\n".join(lines) + "\n")
    good, bad = read_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    quarantined = [r["raw_line"] for r in bad.collect()]
    assert len(quarantined) == 2
    assert "{this is not json" in quarantined  # verbatim for triage


def test_gzip_lines_readable_by_stdlib(spark, tmp_path):
    rows = [(1, "hello world", "en", "s", 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "gz")
    write_jsonl(df, out, target_partitions=1)
    f = glob.glob(os.path.join(out, "part-*.json.gz"))[0]
    with gzip.open(f, "rt") as fh:
        rec = json.loads(fh.readline())
    assert rec == {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}


def test_projection_prunes_json_read_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "proj")
    write_jsonl(table(spark, sf_dir, "documents"), out, compression=None)
    # strict=False trades complement accounting for scan-level pruning.
    good, _ = read_jsonl(spark, out, strict=False)
    plan = good.select("doc_id", "lang").groupBy("lang").count()._jdf.queryExecution().executedPlan().toString()
    # The scan's ReadSchema must carry only the projected fields (plus the
    # corrupt-record channel), not text/n_chars — Jackson then skips the
    # heavy text field entirely.
    scan_line = [ln for ln in plan.split("\n") if "ReadSchema" in ln]
    assert scan_line, plan
    assert "text" not in scan_line[0]


def test_strict_mode_full_accounting_any_projection(spark, tmp_path):
    # In strict mode good/bad are complements even when the caller only
    # counts or projects one column: the mismatch row below is excluded
    # from good regardless of what is read.
    p = tmp_path / "acct"
    p.mkdir()
    (p / "a.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "t", "lang": "en", "source": "s", "n_chars": 1})
        + "\n"
        + json.dumps({"doc_id": 2, "text": "t", "lang": "en", "source": "s", "n_chars": "x"})
        + "\n"
    )
    good, bad = read_jsonl(spark, str(p))
    assert good.count() == 1
    assert [r["doc_id"] for r in good.select("doc_id").collect()] == [1]
    assert bad.count() == 1
    loose_good, _ = read_jsonl(spark, str(p), strict=False)
    # Native semantics: projecting only doc_id, the n_chars mismatch is
    # invisible and both rows parse. (collect, not count: a bare count
    # would prune every field and trip Spark's corrupt-column-only
    # restriction — loose mode inherits the engine's native limits.)
    assert len(loose_good.select("doc_id").collect()) == 2


def test_explicit_schema_no_inference_pass(spark, tmp_path):
    # A file whose second line would widen doc_id to string under
    # inference still parses line 1 and quarantines line 2 under the
    # declared schema — the schema is a contract, not a sample.
    p = tmp_path / "widen"
    p.mkdir()
    (p / "a.jsonl").write_text(
        json.dumps({"doc_id": 7, "text": "t", "lang": "en", "source": "s", "n_chars": 1})
        + "\n"
        + json.dumps({"doc_id": "seven", "text": "t2", "lang": "en", "source": "s", "n_chars": 2})
        + "\n"
    )
    good, bad = read_jsonl(spark, str(p))
    assert [r["doc_id"] for r in good.collect()] == [7]
    assert bad.count() == 1
    assert dict(good.dtypes)["doc_id"] == "bigint"


def test_single_field_schema_reads(spark, tmp_path):
    """greatest() needs two operands; a one-field schema (extract one
    column) must still plan and read."""
    import json as _json

    from pyspark.sql import types as S

    p = tmp_path / "one.jsonl"
    p.write_text("\n".join(_json.dumps({"text": t}) for t in ("a", "b")) + "\n")
    good, bad = read_jsonl(
        spark, str(p), schema=S.StructType([S.StructField("text", S.StringType())])
    )
    assert sorted(r["text"] for r in good.collect()) == ["a", "b"]
    assert bad.count() == 0
