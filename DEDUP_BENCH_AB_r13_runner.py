"""Dedup-family A/B bench: run the family's registry queries in ONE
fresh process against a given tree, 5 reps each, print one JSON line.

Usage: python DEDUP_BENCH_AB_r13_runner.py <tree_path> <label>
"""
import json
import os
import sys
import time

tree, label = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)

from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from polygon_io_data_ingestion_pipeline_spark.session import get_spark  # noqa: E402

FAMILY = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_candidates",
    "docs_line_dedup",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name=f"dedupbench-{label}")
# warm at sf0.001 like bench.py
for name in FAMILY:
    REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

out = {}
for name in FAMILY:
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        reps.append(round(time.perf_counter() - t0, 3))
    out[name] = {"reps": reps, "median": sorted(reps)[2]}

print(json.dumps({"label": label, "tree": tree, "queries": out}))
