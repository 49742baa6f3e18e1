"""Capture .explain('formatted') for benched registry queries.

Usage:
    python plans/r13/capture_plans.py before [name ...]
    python plans/r13/capture_plans.py after  [name ...]

Writes plans/r13/<query>_<suffix>.txt for each benched query (or the
named subset). Plans are built against $SPARK_GRAFT_SF_DIR (default
sf0.1) — same tables the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY
from polygon_io_data_ingestion_pipeline_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(app_name=f"capture-plans-{suffix}")
    for name, spec in REGISTRY.items():
        if not spec.bench and not only:
            continue
        if only and name not in only:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
