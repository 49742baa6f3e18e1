"""IVF index lifecycle under distribution drift.

``append_to_ivf_index`` freezes the codebook, so appends from a shifted
distribution skew the inverted lists and decay recall (drifted vectors
crowd behind centroids trained on the old regime).  These tests pin the
maintenance answer: the imbalance metric detects the drift cheaply, and
``rebalance_ivf_index`` (retrain on current contents + rebuild + atomic
directory swap) recovers recall — measured against exact brute-force
kNN, not against itself.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.operators import similarity as S

DIM = 8


def _clusters(rng, axes, sign, n_per=100):
    out = []
    for c in axes:
        mu = np.zeros(DIM)
        mu[c] = sign
        out.append(mu + 0.05 * rng.standard_normal((n_per, DIM)))
    return np.vstack(out)


def _df(spark, mat, start):
    return spark.createDataFrame(
        [(start + i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def drifted_index(spark, tmp_path_factory):
    rng = np.random.default_rng(42)
    base = _clusters(rng, range(4), +1.0)  # old regime: +axes 0..3
    drift = _clusters(rng, range(4, 8), -1.0)  # new regime: -axes 4..7
    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    cents = S.kmeans_centroids(_df(spark, base, 0), nlist=8, max_train_rows=10_000)
    S.build_ivf_index(_df(spark, base, 0), idx, centroids=cents)
    S.append_to_ivf_index(_df(spark, drift, 1000), idx)
    all_vecs = np.vstack([base, drift])
    ids = np.array(list(range(0, 400)) + list(range(1000, 1400)))
    return idx, all_vecs, ids, drift


def _recall(spark, idx, all_vecs, ids, qvec, k=10, nprobe=2):
    cb = S.read_ivf_codebook(idx)
    got = {
        r["vec_id"]
        for r in S.ivf_topk_indexed(
            spark, idx, cb, [float(v) for v in qvec], k=k, nprobe=nprobe
        ).collect()
    }
    sims = all_vecs @ qvec / (np.linalg.norm(all_vecs, axis=1) * np.linalg.norm(qvec))
    true = set(ids[np.argsort(-sims)[:k]])
    return len(got & true) / k


def test_rebalance_recovers_recall_after_drift(spark, drifted_index):
    idx, all_vecs, ids, drift = drifted_index
    queries = [drift[i] for i in (0, 100, 200, 300)]  # one per drifted cluster

    before_meta = S.ivf_index_imbalance(spark, idx)
    assert before_meta["n_vectors"] == 800
    before = np.mean([_recall(spark, idx, all_vecs, ids, q) for q in queries])
    assert before <= 0.9, "drift scenario no longer degrades recall — test is vacuous"

    res = S.rebalance_ivf_index(spark, idx, max_train_rows=10_000)
    assert res["rebuilt"] is True
    assert res["after"]["n_vectors"] == 800  # no rows lost in the swap

    after = np.mean([_recall(spark, idx, all_vecs, ids, q) for q in queries])
    assert after >= 0.95
    assert after > before
    # identity preserved: every id still in the index exactly once
    got_ids = [r["vec_id"] for r in spark.read.parquet(idx).select("vec_id").collect()]
    assert sorted(got_ids) == sorted(ids.tolist())
    # staging dir gone, sidecar codebook refreshed, lock released
    assert not os.path.exists(idx + "__rebalance_staging")
    assert not os.path.exists(S._ivf_lock_path(idx))


def test_rebalance_above_threshold_skips_the_rebuild(spark, tmp_path):
    rng = np.random.default_rng(7)
    base = _clusters(rng, range(4), +1.0, n_per=50)
    idx = str(tmp_path / "index")
    cents = S.kmeans_centroids(_df(spark, base, 0), nlist=4, max_train_rows=10_000)
    S.build_ivf_index(_df(spark, base, 0), idx, centroids=cents)
    cb_before = json.load(open(os.path.join(idx, "_codebook.json")))
    res = S.rebalance_ivf_index(spark, idx, rebalance_above=100.0)
    assert res["rebuilt"] is False
    assert json.load(open(os.path.join(idx, "_codebook.json"))) == cb_before


def test_imbalance_metric_shape(spark, tmp_path):
    rng = np.random.default_rng(7)
    base = _clusters(rng, range(2), +1.0, n_per=50)
    idx = str(tmp_path / "index")
    cents = S.kmeans_centroids(_df(spark, base, 0), nlist=4, max_train_rows=10_000)
    S.build_ivf_index(_df(spark, base, 0), idx, centroids=cents)
    m = S.ivf_index_imbalance(spark, idx)
    assert m["n_vectors"] == 100 and m["n_lists"] == 4
    assert m["imbalance"] >= 1.0  # FAISS factor: 1.0 is the balanced floor
    assert m["empty_lists"] + len(
        {r["list_id"] for r in spark.read.parquet(idx).select("list_id").distinct().collect()}
    ) == 4
