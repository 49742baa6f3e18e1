"""Incremental rollup maintenance: shard folding == full recompute
(count/sum AND min/max/HLL-distinct), replay no-ops, first-shard
bootstrap, mean derivability, and the atomic versioned commit — a crash
between table write and ledger publish must replay cleanly, never
double-count."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators import rollup as rollup_mod
from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
    read_rollup,
    update_rollup,
)


def _shard(spark, rows):
    return spark.createDataFrame(rows, "k string, v double, w long")


def _ledger(path: str) -> list[str]:
    commits = sorted(glob.glob(os.path.join(path, "_commit_v*.json")))
    assert commits, f"no commit files under {path}"
    return json.load(open(commits[-1]))["applied_shards"]


def test_incremental_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    shards = [
        [("a", 1.0, 10), ("a", 2.0, 20), ("b", 3.0, 30)],
        [("a", 4.0, 40), ("c", 5.0, 50)],
        [("b", 6.0, 60), ("c", 7.0, 70), ("c", 8.0, 80)],
    ]
    for i, rows in enumerate(shards):
        res = update_rollup(spark, path, _shard(spark, rows), ["k"], ["v", "w"], f"s{i}")
        assert res["applied"]

    got = {r["k"]: r for r in read_rollup(spark, path).collect()}
    full = _shard(spark, [r for s in shards for r in s]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("sum_v"),
        F.sum("w").alias("sum_w"),
    )
    want = {r["k"]: r for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_rows"] == want[k]["n_rows"]
        assert got[k]["sum_v"] == want[k]["sum_v"]
        assert got[k]["sum_w"] == want[k]["sum_w"]
    # mean is derivable without ever storing a non-mergeable aggregate
    assert got["a"]["sum_v"] / got["a"]["n_rows"] == (1.0 + 2.0 + 4.0) / 3


def test_min_max_hll_fold_equals_full_recompute(spark, tmp_path):
    """min/max and HLL-distinct cells are mergeable too: folding shard
    partials must equal one full groupBy of everything (HLL estimates
    are exact at these cardinalities)."""
    path = str(tmp_path / "rollup")
    shards = [
        [("a", 5.0, 10), ("a", 2.0, 10), ("b", 3.0, 30)],
        [("a", 9.0, 40), ("b", -1.0, 30), ("c", 5.0, 50)],
        [("a", 7.0, 10), ("c", 8.0, 80)],
    ]
    for i, rows in enumerate(shards):
        update_rollup(
            spark,
            path,
            _shard(spark, rows),
            ["k"],
            sum_cols=["v"],
            shard_id=f"s{i}",
            min_cols=["v"],
            max_cols=["v"],
            distinct_cols=["w"],
        )
    got = {r["k"]: r for r in read_rollup(spark, path).collect()}
    full = _shard(spark, [r for s in shards for r in s]).groupBy("k").agg(
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.countDistinct("w").alias("nd_w"),
    )
    want = {r["k"]: r for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["min_v"] == want[k]["min_v"]
        assert got[k]["max_v"] == want[k]["max_v"]
        assert got[k]["distinct_w"] == want[k]["nd_w"]
    # the sketch cell itself remains available for further merging
    assert isinstance(got["a"]["hll_w"], (bytes, bytearray))


def test_replayed_shard_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "rollup")
    rows = [("a", 1.0, 1)]
    assert update_rollup(spark, path, _shard(spark, rows), ["k"], ["v", "w"], "s0")["applied"]
    before = {(r["k"], r["n_rows"], r["sum_v"]) for r in read_rollup(spark, path).collect()}
    res = update_rollup(spark, path, _shard(spark, rows), ["k"], ["v", "w"], "s0")
    assert not res["applied"]
    after = {(r["k"], r["n_rows"], r["sum_v"]) for r in read_rollup(spark, path).collect()}
    assert after == before


def test_ledger_rides_in_the_commit_and_survives_versions(spark, tmp_path):
    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    update_rollup(spark, path, _shard(spark, [("a", 2.0, 2)]), ["k"], ["v"], "s1")
    assert _ledger(path) == ["s0", "s1"]
    got = read_rollup(spark, path).collect()[0]
    assert got["n_rows"] == 2 and got["sum_v"] == 3.0


def test_crash_between_table_and_commit_replays_cleanly(spark, tmp_path, monkeypatch):
    """THE atomicity property (ADVICE r6 medium): a crash after the
    merged table is written but before the commit publishes must leave
    version N-1 authoritative, and the foreachBatch-style replay of the
    same shard must produce the correct total — not a double count."""
    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")

    real_publish = rollup_mod._publish_commit

    def crash(_path, _commit):
        raise RuntimeError("simulated crash before commit publish")

    monkeypatch.setattr(rollup_mod, "_publish_commit", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        update_rollup(spark, path, _shard(spark, [("a", 10.0, 2)]), ["k"], ["v"], "s1")
    monkeypatch.setattr(rollup_mod, "_publish_commit", real_publish)

    # the orphan table_v2 exists but is uncommitted: reads see v1 only
    assert _ledger(path) == ["s0"]
    assert read_rollup(spark, path).collect()[0]["sum_v"] == 1.0

    # replay of the SAME shard (at-least-once delivery) applies once
    res = update_rollup(spark, path, _shard(spark, [("a", 10.0, 2)]), ["k"], ["v"], "s1")
    assert res["applied"]
    got = read_rollup(spark, path).collect()[0]
    assert got["sum_v"] == 11.0 and got["n_rows"] == 2
    assert _ledger(path) == ["s0", "s1"]


def test_old_versions_are_garbage_collected(spark, tmp_path):
    path = str(tmp_path / "rollup")
    for i in range(4):
        update_rollup(spark, path, _shard(spark, [("a", 1.0, i)]), ["k"], ["v"], f"s{i}")
    tables = sorted(os.path.basename(p) for p in glob.glob(os.path.join(path, "table_v*")))
    commits = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "_commit_v*.json"))
    )
    # latest + one previous version for in-flight readers, nothing older
    assert tables == ["table_v000003", "table_v000004"]
    assert commits == ["_commit_v000003.json", "_commit_v000004.json"]


def test_spec_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    with pytest.raises(ValueError, match="spec mismatch"):
        update_rollup(
            spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s1", min_cols=["w"]
        )


def test_corrupt_table_raises_instead_of_cold_starting(spark, tmp_path):
    """A damaged aggregate table must fail the update loudly — never be
    silently treated as a cold start (which would replace the
    accumulated rollup with one shard's worth of data)."""
    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    # corrupt the committed table: truncate every parquet footer
    table = glob.glob(os.path.join(path, "table_v*"))[0]
    for root, _dirs, files in os.walk(table):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "r+b") as fh:
                    fh.truncate(4)
    with pytest.raises(Exception):
        update_rollup(spark, path, _shard(spark, [("a", 2.0, 2)]), ["k"], ["v"], "s1")
    # the failed update must not have been recorded as applied
    assert _ledger(path) == ["s0"]


def test_histogram_fold_equals_full_recompute(spark, tmp_path):
    """Fixed-bin histogram cells merge by element-wise sum: folding
    shard partials must equal one full binned groupBy of everything,
    including out-of-range clamping into the edge bins."""
    from collections import Counter

    path = str(tmp_path / "rollup")
    shards = [
        [("a", 0.5, 1), ("a", 3.5, 1), ("b", 9.9, 1)],
        [("a", -2.0, 1), ("b", 12.0, 1), ("c", 5.0, 1)],  # clamped rows
        [("a", 3.6, 1), ("c", 7.7, 1), ("c", None, 1)],  # NULL: no bin
    ]
    lo, hi, bins = 0.0, 10.0, 5
    for i, rows in enumerate(shards):
        update_rollup(
            spark,
            path,
            _shard(spark, rows),
            ["k"],
            sum_cols=[],
            shard_id=f"s{i}",
            hist_cols={"v": (lo, hi, bins)},
        )
    got = {r["k"]: list(r["hist_v"]) for r in read_rollup(spark, path).collect()}

    width = (hi - lo) / bins
    want: dict[str, Counter] = {}
    for rows in shards:
        for k, v, _w in rows:
            if v is None:
                continue
            b = min(max(int((v - lo) // width), 0), bins - 1)
            want.setdefault(k, Counter())[b] += 1
    for k, cnt in want.items():
        assert got[k] == [cnt.get(i, 0) for i in range(bins)], k


def test_histogram_quantile_interpolates(spark, tmp_path):
    """Quantiles read out of the cells: exact at bin boundaries, linear
    inside a bin, NULL for empty cells."""
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        histogram_quantile,
    )

    # 100 uniform values in [0, 10): quantile(p) ~= 10p
    rows = [("a", i / 10.0, 1) for i in range(100)]
    path = str(tmp_path / "rollup")
    update_rollup(
        spark, path, _shard(spark, rows), ["k"], [], "s0",
        hist_cols={"v": (0.0, 10.0, 20)},
    )
    df = read_rollup(spark, path)
    got = df.select(
        histogram_quantile("hist_v", 0.0, 10.0, 20, 0.5).alias("p50"),
        histogram_quantile("hist_v", 0.0, 10.0, 20, 0.9).alias("p90"),
        histogram_quantile("hist_v", 0.0, 10.0, 20, 1.0).alias("p100"),
    ).collect()[0]
    assert abs(got["p50"] - 5.0) < 0.5
    assert abs(got["p90"] - 9.0) < 0.5
    assert abs(got["p100"] - 10.0) < 0.5
    # empty cell -> NULL estimate
    empty = spark.createDataFrame(
        [([0] * 20,)], "hist_v array<long>"
    ).select(histogram_quantile("hist_v", 0.0, 10.0, 20, 0.5).alias("q"))
    assert empty.collect()[0]["q"] is None


def test_pre_histogram_commit_stays_updatable(spark, tmp_path):
    """Commits written before the hist_cols field existed must keep
    accepting histogram-free updates (missing key == empty spec)."""
    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    # strip the hist_cols key the way an old commit file would lack it
    commit_path = sorted(glob.glob(os.path.join(path, "_commit_v*.json")))[-1]
    c = json.load(open(commit_path))
    c["spec"].pop("hist_cols")
    json.dump(c, open(commit_path, "w"))
    res = update_rollup(spark, path, _shard(spark, [("a", 2.0, 2)]), ["k"], ["v"], "s1")
    assert res["applied"]
    assert read_rollup(spark, path).collect()[0]["sum_v"] == 3.0


def test_time_travel_reads_previous_version(spark, tmp_path):
    """A reader pinned to version N-1 sees the pre-update table while
    the pointer advances; GC'd versions raise with the available list."""
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        rollup_versions,
    )

    path = str(tmp_path / "rollup")
    for i in range(3):
        update_rollup(
            spark, path, _shard(spark, [("a", float(i + 1), i)]), ["k"], ["v"], f"s{i}"
        )
    vers = rollup_versions(path)
    assert [v["version"] for v in vers] == [2, 3]
    assert vers[-1]["n_shards"] == 3
    assert read_rollup(spark, path, version=2).collect()[0]["sum_v"] == 3.0
    assert read_rollup(spark, path, version=3).collect()[0]["sum_v"] == 6.0
    assert read_rollup(spark, path).collect()[0]["sum_v"] == 6.0
    with pytest.raises(FileNotFoundError, match=r"available: \[2, 3\]"):
        read_rollup(spark, path, version=1)


def test_hist_spec_validation(spark, tmp_path):
    path = str(tmp_path / "rollup")
    with pytest.raises(ValueError, match="hist_cols"):
        update_rollup(
            spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], [], "s0",
            hist_cols={"v": (5.0, 5.0, 10)},
        )
    with pytest.raises(ValueError, match="hist_cols"):
        update_rollup(
            spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], [], "s0",
            hist_cols={"v": (0.0, 1.0, 100000)},
        )


def _smp_shard(spark, rows):
    """(k, id, v) rows — id is the row-unique tag source."""
    return spark.createDataFrame(rows, "k string, id long, v double")


def test_sample_fold_equals_global_bottom_k(spark, tmp_path):
    """Bottom-k hash-sample cells merge losslessly: folding per-shard
    bottom-ks must equal the k smallest md5 tags over ALL rows, NULL
    values excluded, short keys exact (sample == population)."""
    import hashlib

    path = str(tmp_path / "rollup")
    rows = [("a", i, float(i % 17)) for i in range(40)]
    rows += [("b", 100 + i, float(i)) for i in range(3)]  # fewer than k
    rows += [("a", 999, None), ("b", 998, None)]  # NULLs: never sampled
    shards = [rows[0::3], rows[1::3], rows[2::3]]
    k = 8
    for i, shard in enumerate(shards):
        update_rollup(
            spark,
            path,
            _smp_shard(spark, shard),
            ["k"],
            sum_cols=[],
            shard_id=f"s{i}",
            sample_cols={"v": ("id", k)},
        )
    got = {
        r["k"]: [(s["tag"], s["val"]) for s in r["smp_v"]]
        for r in read_rollup(spark, path).collect()
    }

    want: dict[str, list] = {}
    for key, rid, v in rows:
        if v is None:
            continue
        tag = hashlib.md5(str(rid).encode()).hexdigest()
        want.setdefault(key, []).append((tag, v))
    for key in want:
        want[key] = sorted(want[key])[:k]
    assert got == want
    assert len(got["b"]) == 3  # short key keeps everything


def test_sample_quantile_matches_numpy(spark, tmp_path):
    """sample_quantile == numpy type-7 quantile over the sampled values;
    exact-population keys give the exact quantile; empty cells NULL."""
    import hashlib

    import numpy as np

    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        sample_quantile,
    )

    path = str(tmp_path / "rollup")
    rows = [("a", i, float((i * 37) % 101)) for i in range(200)]
    k = 32
    update_rollup(
        spark,
        path,
        _smp_shard(spark, rows),
        ["k"],
        [],
        "s0",
        sample_cols={"v": ("id", k)},
    )
    got = (
        read_rollup(spark, path)
        .select(
            sample_quantile("smp_v", 0.5).alias("p50"),
            sample_quantile("smp_v", 0.9).alias("p90"),
            sample_quantile("smp_v", 0.0).alias("p0"),
            sample_quantile("smp_v", 1.0).alias("p100"),
        )
        .collect()[0]
    )
    tagged = sorted(
        (hashlib.md5(str(rid).encode()).hexdigest(), v) for _k, rid, v in rows
    )[:k]
    sample = np.array([v for _t, v in tagged])
    for prob, col in ((0.5, "p50"), (0.9, "p90"), (0.0, "p0"), (1.0, "p100")):
        assert abs(got[col] - float(np.quantile(sample, prob))) < 1e-9, prob
    # empty cell -> NULL
    empty = spark.sql(
        "SELECT CAST(array() AS array<struct<tag:string,val:double>>) AS c"
    ).select(sample_quantile("c", 0.5).alias("q"))
    assert empty.collect()[0]["q"] is None


def test_sample_spec_validation_and_replay(spark, tmp_path):
    path = str(tmp_path / "rollup")
    with pytest.raises(ValueError, match="sample_cols"):
        update_rollup(
            spark, path, _smp_shard(spark, [("a", 1, 1.0)]), ["k"], [], "s0",
            sample_cols={"v": ("id", 0)},
        )
    with pytest.raises(ValueError, match="sample_cols"):
        update_rollup(
            spark, path, _smp_shard(spark, [("a", 1, 1.0)]), ["k"], [], "s0",
            sample_cols={"v": ("", 4)},
        )
    update_rollup(
        spark, path, _smp_shard(spark, [("a", 1, 1.0)]), ["k"], [], "s0",
        sample_cols={"v": ("id", 4)},
    )
    res = update_rollup(
        spark, path, _smp_shard(spark, [("a", 2, 2.0)]), ["k"], [], "s0",
        sample_cols={"v": ("id", 4)},
    )
    assert not res["applied"]  # replayed shard id is a ledger no-op


def _tk_shard(spark, rows):
    return spark.createDataFrame(rows, "k string, item string")


def test_topk_exact_when_m_covers_distinct_items(spark, tmp_path):
    """With m >= distinct items per key the heavy-hitter cell is EXACT:
    folding shards equals the plain GROUP BY counts with err=0."""
    from collections import Counter

    path = str(tmp_path / "rollup")
    shards = [
        [("a", "x"), ("a", "y"), ("a", "x"), ("b", "p")],
        [("a", "x"), ("a", "z"), ("b", "q"), ("b", "p")],
        [("a", "y"), ("a", "x"), ("b", None)],  # NULL items never counted
    ]
    for i, rows in enumerate(shards):
        update_rollup(
            spark, path, _tk_shard(spark, rows), ["k"], [], f"s{i}",
            topk_cols={"item": 8},
        )
    got = {
        r["k"]: ({(s["item"], s["cnt"]) for s in r["topk_item"]["items"]},
                 r["topk_item"]["err"])
        for r in read_rollup(spark, path).collect()
    }
    want: dict[str, Counter] = {}
    for rows in shards:
        for k, it in rows:
            if it is not None:
                want.setdefault(k, Counter())[it] += 1
    assert got == {k: (set(c.items()), 0) for k, c in want.items()}


def test_topk_guarantee_under_truncation(spark, tmp_path):
    """With m smaller than the distinct-item count, stored counts stay
    UPPER bounds of the truth and every item whose true count exceeds
    the cell's err is guaranteed present (the mergeable-summaries
    contract); the heavy item's estimate is exact here because it is
    never truncated."""
    from collections import Counter

    path = str(tmp_path / "rollup")
    # heavy item "hh" dominates; a long tail of singletons forces
    # truncation in every shard and at every merge
    shards = []
    truth: Counter = Counter()
    for i in range(4):
        rows = [("a", "hh")] * 10 + [("a", f"t{i}_{j}") for j in range(6)]
        shards.append(rows)
        truth.update(it for _k, it in rows)
    m = 3
    for i, rows in enumerate(shards):
        update_rollup(
            spark, path, _tk_shard(spark, rows), ["k"], [], f"s{i}",
            topk_cols={"item": m},
        )
    cell = read_rollup(spark, path).collect()[0]["topk_item"]
    stored = {s["item"]: s["cnt"] for s in cell["items"]}
    err = cell["err"]
    assert len(stored) <= m and err >= 1
    for item, cnt in stored.items():
        assert cnt >= truth[item], (item, cnt, truth[item])  # upper bound
    present_guaranteed = {it for it, c in truth.items() if c > err}
    assert present_guaranteed <= set(stored)
    assert stored["hh"] >= 40  # the heavy hitter is never lost


def test_topk_spec_validation(spark, tmp_path):
    path = str(tmp_path / "rollup")
    with pytest.raises(ValueError, match="topk_cols"):
        update_rollup(
            spark, path, _tk_shard(spark, [("a", "x")]), ["k"], [], "s0",
            topk_cols={"item": 0},
        )


def test_rollup_hist_drift_flags_shifted_shard(spark, tmp_path):
    """Version-to-version PSI from histogram cells: a same-distribution
    shard reads stable, a shifted shard reads drifted, and the delta
    counts equal the new shard's own histogram exactly (append-only
    cells subtract losslessly)."""
    import random

    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        rollup_hist_counts,
        rollup_hist_drift,
        rollup_versions,
    )

    rng = random.Random(7)
    lo_rows = [("a", rng.uniform(0, 4), 1) for _ in range(400)]
    hi_rows = [("a", rng.uniform(6, 10), 1) for _ in range(400)]
    path = str(tmp_path / "rollup")
    H = {"v": (0.0, 10.0, 10)}

    update_rollup(spark, path, _shard(spark, lo_rows[:200]), ["k"], [], "s0", hist_cols=H)
    update_rollup(spark, path, _shard(spark, lo_rows[200:]), ["k"], [], "s1", hist_cols=H)
    stable = rollup_hist_drift(spark, path, "v").collect()[0]
    assert stable["drifted"] == 0 and stable["psi"] < 0.1
    assert stable["n_ref"] == 200 and stable["n_cur"] == 200  # delta = shard s1

    update_rollup(spark, path, _shard(spark, hi_rows), ["k"], [], "s2", hist_cols=H)
    drifted = rollup_hist_drift(spark, path, "v").collect()[0]
    assert drifted["drifted"] == 1 and drifted["psi"] > 0.25
    assert drifted["n_cur"] == 400

    # exact delta: latest - previous == shard s2's own binned counts
    vers = [v["version"] for v in rollup_versions(path)]
    cur = {r["b"]: r["cnt"] for r in rollup_hist_counts(spark, path, "v", vers[-1]).collect()}
    prev = {r["b"]: r["cnt"] for r in rollup_hist_counts(spark, path, "v", vers[-2]).collect()}
    delta = {b: cur[b] - prev.get(b, 0) for b in cur if cur[b] - prev.get(b, 0)}
    want: dict[int, int] = {}
    for _k, v, _w in hi_rows:
        b = min(max(int(v // 1.0), 0), 9)
        want[b] = want.get(b, 0) + 1
    assert delta == want

    # cumulative mode: whole-stream vs whole-stream, diluted signal
    cum = rollup_hist_drift(spark, path, "v", mode="cumulative").collect()[0]
    assert cum["n_ref"] == 400 and cum["n_cur"] == 800
    with pytest.raises(ValueError, match="mode"):
        rollup_hist_drift(spark, path, "v", mode="nope")


def test_concurrent_updaters_lose_no_delta(spark, tmp_path):
    """Two updaters racing on the same rollup serialize on the
    maintenance lease: every shard lands exactly once, regardless of
    interleaving — the lost-update race the lease + atomic commit
    exist to prevent (each updater merges against the version its
    predecessor committed, never a stale read)."""
    import threading

    path = str(tmp_path / "rollup")
    n_threads, shards_each = 2, 5
    errors: list[Exception] = []

    def updater(t: int) -> None:
        try:
            for i in range(shards_each):
                update_rollup(
                    spark,
                    path,
                    _shard(spark, [("a", 1.0, 1), ("b", 2.0, 1)]),
                    ["k"],
                    ["v"],
                    f"t{t}_s{i}",
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=updater, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    total = n_threads * shards_each
    got = {r["k"]: (r["n_rows"], r["sum_v"]) for r in read_rollup(spark, path).collect()}
    assert got == {"a": (total, 1.0 * total), "b": (total, 2.0 * total)}
    latest = sorted(glob.glob(os.path.join(path, "_commit_v*.json")))[-1]
    assert sorted(json.load(open(latest))["applied_shards"]) == sorted(
        f"t{t}_s{i}" for t in range(n_threads) for i in range(shards_each)
    )


def test_sample_partial_plan_reuses_one_exchange(spark):
    """The sample-cell partial level must not pay a second shuffle: the
    rank window's hash partitioning on the keys is exactly what the
    groupBy needs, so the executed plan holds ONE Exchange — the scale
    contract of the bottom-k cell (the fact stream is shuffled once)."""
    import re

    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        _agg_exprs,
        _with_sample_ranks,
    )

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, id long, v double")
    spec = {"v": ("id", 8)}
    src = _with_sample_ranks(df, ["k"], spec)
    delta = src.groupBy("k").agg(
        *_agg_exprs([], [], [], [], {}, merge=False, sample_cols=spec)
    )
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_legacy_layout_refuses_cold_start(spark, tmp_path):
    """A pre-versioned rollup dir (table/ + _applied_shards.json, no
    commit files) must raise with migration guidance, never be silently
    replaced by one shard's worth of data."""
    path = str(tmp_path / "rollup")
    os.makedirs(os.path.join(path, "table"))
    with open(os.path.join(path, "_applied_shards.json"), "w") as fh:
        fh.write('["old_shard"]')
    with pytest.raises(ValueError, match="pre-versioned rollup layout"):
        update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    with pytest.raises(ValueError, match="pre-versioned rollup layout"):
        read_rollup(spark, path)


def test_commit_versions_survive_six_digit_overflow(tmp_path):
    """Version 1,000,000 grows a seventh digit: parsing and ordering
    must use the integer, not the six-digit pattern or path sort."""
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        _latest_commit,
        _publish_commit,
        rollup_versions,
    )

    path = str(tmp_path / "rollup")
    os.makedirs(path)
    for v in (999999, 1000000):
        _publish_commit(
            path,
            {"version": v, "table": f"table_v{v:06d}", "applied_shards": [], "spec": {}},
        )
    assert _latest_commit(path)["version"] == 1000000
    assert [x["version"] for x in rollup_versions(path)] == [999999, 1000000]


# --- round 8: grouping-set cells ----------------------------------------------


def _gs_shard(spark, rows):
    return spark.createDataFrame(rows, "r string, s string, id long, v double")


_GS_SHARDS = [
    [("eu", "a", 1, 1.0), ("eu", "b", 2, 2.0), ("us", "a", 3, 4.0)],
    [("eu", "a", 4, 8.0), ("us", "b", 5, 16.0), ("us", "b", 6, 32.0)],
    [("ap", "a", 7, 64.0), ("eu", "b", 8, 128.0)],
]


def test_cube_fold_equals_full_recompute(spark, tmp_path):
    """Shard-fold == full recompute for a CUBE spec over EVERY cell
    family (count/sum/min/max/HLL/hist/sample/topk-exact) at every
    grouping-set level."""
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        cube_sets,
        grouping_set_id,
    )

    keys = ["r", "s"]
    kw = dict(
        min_cols=["v"], max_cols=["v"], distinct_cols=["s"],
        hist_cols={"v": (0.0, 130.0, 13)}, sample_cols={"v": ("id", 3)},
        topk_cols={"s": 8},  # m covers the domain -> exact
        grouping_sets=cube_sets(keys),
    )
    path = str(tmp_path / "cube")
    for i, rows in enumerate(_GS_SHARDS):
        assert update_rollup(
            spark, path, _gs_shard(spark, rows), keys, ["v"], f"s{i}", **kw
        )["applied"]
    folded = read_rollup(spark, path).collect()

    # full recompute: one-shot update over the concatenated facts
    full_path = str(tmp_path / "cube_full")
    allrows = [r for s in _GS_SHARDS for r in s]
    update_rollup(
        spark, full_path, _gs_shard(spark, allrows), keys, ["v"], "all", **kw
    )
    want = {
        (r["_gid"], r["r"], r["s"]): r
        for r in read_rollup(spark, full_path).collect()
    }
    assert len(folded) == len(want)
    for row in folded:
        w = want[(row["_gid"], row["r"], row["s"])]
        assert row["n_rows"] == w["n_rows"]
        assert row["sum_v"] == w["sum_v"]
        assert row["min_v"] == w["min_v"] and row["max_v"] == w["max_v"]
        assert list(row["hist_v"]) == list(w["hist_v"])
        assert [(s["tag"], s["val"]) for s in row["smp_v"]] == [
            (s["tag"], s["val"]) for s in w["smp_v"]
        ]
        assert sorted((i["item"], i["cnt"]) for i in row["topk_s"]["items"]) == sorted(
            (i["item"], i["cnt"]) for i in w["topk_s"]["items"]
        )

    # spot-check levels against hand math: grand total + one subtotal
    by = {(r["_gid"], r["r"], r["s"]): r for r in folded}
    gid_all = grouping_set_id(keys, [])
    gid_r = grouping_set_id(keys, ["r"])
    gid_full = grouping_set_id(keys, keys)
    assert by[(gid_all, None, None)]["n_rows"] == 8
    assert by[(gid_all, None, None)]["sum_v"] == 255.0
    assert by[(gid_r, "eu", None)]["sum_v"] == 1.0 + 2.0 + 8.0 + 128.0
    assert by[(gid_r, "us", None)]["max_v"] == 32.0
    assert by[(gid_full, "ap", "a")]["n_rows"] == 1


def test_rollup_sets_and_spec_guards(spark, tmp_path):
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        grouping_set_id,
        rollup_sets,
    )

    keys = ["r", "s"]
    assert rollup_sets(keys) == [["r", "s"], ["r"], []]
    path = str(tmp_path / "roll")
    update_rollup(
        spark, path, _gs_shard(spark, _GS_SHARDS[0]), keys, ["v"], "s0",
        grouping_sets=rollup_sets(keys),
    )
    got = read_rollup(spark, path)
    assert got.filter(F.col("_gid") == grouping_set_id(keys, [])).count() == 1
    # ROLLUP omits the s-only level entirely
    assert got.filter(F.col("_gid") == grouping_set_id(keys, ["s"])).count() == 0
    # spec is part of the committed contract: flat update must be refused
    with pytest.raises(ValueError, match="spec mismatch"):
        update_rollup(
            spark, path, _gs_shard(spark, _GS_SHARDS[1]), keys, ["v"], "s1"
        )
    # and a non-subset grouping set is rejected up front
    with pytest.raises(ValueError, match="not a subset"):
        update_rollup(
            spark, path, _gs_shard(spark, _GS_SHARDS[1]), keys, ["v"], "s1",
            grouping_sets=[["nope"]],
        )


def test_grouping_set_replay_and_real_null_keys(spark, tmp_path):
    """Replays stay no-ops with grouping sets on, and a REAL null key
    value stays distinguishable from a rolled-up key (different _gid)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        cube_sets,
        grouping_set_id,
    )

    keys = ["r", "s"]
    path = str(tmp_path / "nulls")
    rows = [("eu", None, 1, 1.0), ("eu", "b", 2, 2.0)]
    update_rollup(spark, path, _gs_shard(spark, rows), keys, ["v"], "s0",
                  grouping_sets=cube_sets(keys))
    assert not update_rollup(
        spark, path, _gs_shard(spark, rows), keys, ["v"], "s0",
        grouping_sets=cube_sets(keys),
    )["applied"]
    got = {(r["_gid"], r["r"], r["s"]): r for r in read_rollup(spark, path).collect()}
    gid_full = grouping_set_id(keys, keys)
    gid_r = grouping_set_id(keys, ["r"])
    # real null s at the finest level...
    assert got[(gid_full, "eu", None)]["sum_v"] == 1.0
    # ...does not collide with the r-subtotal (which covers BOTH rows)
    assert got[(gid_r, "eu", None)]["sum_v"] == 3.0
