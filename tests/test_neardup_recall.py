"""Recall + exactness of the RP-LSH near-dup path vs the exact
quadratic baseline (``cosine_pairs``), at sf0.01 as VERDICT r2 asked.

RP-LSH is not lossless by construction (unlike the SimHash pigeonhole
join), so recall needs an asserted floor. Per-table collision
probability for a pair at angle theta is (1 - theta/pi)^n_planes, and
tables are independent — so recall is tuned by (n_planes down,
n_tables up). At threshold 0.3 (theta ~ 72.5 deg):

- registry config 6 planes x 4 tables  -> ~0.19 measured recall
  (cheap candidate generation; the driver oracle replicates the same
  planes so its parity is deterministic, not recall-dependent);
- recall config   3 planes x 16 tables -> ~0.99 measured recall.

Exactness is unconditional: every emitted pair is verified with exact
cosine, so the LSH output is always a value-identical subset of the
exact pairs, at any config.
"""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
    cosine_neardup_lsh,
    cosine_pairs,
)
from polygon_io_data_ingestion_pipeline_spark.sources import table

SF_001 = "/root/testdata/sf0.01"
THRESHOLD = 0.3


@pytest.fixture(scope="module")
def exact_pairs(spark):
    emb = table(spark, SF_001, "embeddings")
    rows = cosine_pairs(emb, THRESHOLD).collect()
    return {(r["id1"], r["id2"]): r["cos"] for r in rows}


def _lsh(spark, n_planes, n_tables):
    emb = table(spark, SF_001, "embeddings")
    rows = cosine_neardup_lsh(emb, THRESHOLD, n_planes, n_tables).collect()
    return {(r["id1"], r["id2"]): r["cos"] for r in rows}


def test_recall_config_meets_floor_and_is_exact(spark, exact_pairs):
    lsh = _lsh(spark, n_planes=3, n_tables=16)
    # every emitted pair really is >= threshold, with the exact cosine
    assert set(lsh) <= set(exact_pairs)
    assert all(lsh[k] == exact_pairs[k] for k in lsh)
    recall = len(set(lsh) & set(exact_pairs)) / len(exact_pairs)
    assert recall >= 0.95, f"recall {recall:.3f} below floor at 3 planes x 16 tables"


def test_registry_config_is_exact_subset(spark, exact_pairs):
    # the windowed registry query's config: low recall by design (the
    # driver oracle replicates its planes), but always value-exact
    lsh = _lsh(spark, n_planes=6, n_tables=4)
    assert set(lsh) <= set(exact_pairs)
    assert all(lsh[k] == exact_pairs[k] for k in lsh)
    recall = len(set(lsh) & set(exact_pairs)) / len(exact_pairs)
    assert recall >= 0.10, f"registry-config recall collapsed: {recall:.3f}"
