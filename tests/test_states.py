"""Incremental validation states (operators/states.py): merge exactness,
store resume semantics, partition pruning, verdict bridge, histogram
states."""

import os

import pytest
from pyspark.sql import Row, functions as F

from jsonschema_valid_spark.operators.states import (
    StateStore,
    column_states,
    histogram_states,
    incremental_column_states,
    merge_histogram_states,
    merge_states,
    metrics_from_states,
    stats_verdicts_from_states,
)


@pytest.fixture()
def seq_df(spark):
    rows = []
    for i in range(400):
        rows.append(Row(
            doc_id=f"doc-{i:04d}",
            n_tok=(i * 37) % 120 + 8 if i % 13 else None,
            source=["web", "book", "code", None][i % 4],
        ))
    return spark.createDataFrame(rows)


def _metrics_map(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_merged_states_equal_whole_table(spark, seq_df):
    states = column_states(seq_df, ["n_tok", "source"],
                           partition_col="source")
    got = _metrics_map(metrics_from_states(merge_states(states)))

    direct = seq_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("n_tok").alias("nn"),
        F.avg("n_tok").alias("mean"),
        F.stddev("n_tok").alias("sd"),
        F.min(F.col("n_tok").cast("double")).alias("mn"),
        F.max(F.col("n_tok").cast("double")).alias("mx"),
    ).collect()[0]

    m = got["n_tok"]
    assert m["n"] == direct["n"] == 400
    assert m["n_nonnull"] == direct["nn"]
    assert m["null_rate"] == pytest.approx((400 - direct["nn"]) / 400, abs=0)
    assert m["mean"] == pytest.approx(direct["mean"], rel=1e-12)
    assert m["stddev"] == pytest.approx(direct["sd"], rel=1e-9)
    assert m["min"] == direct["mn"] and m["max"] == direct["mx"]

    s = got["source"]
    assert s["n"] == 400 and s["n_nonnull"] == 300
    # non-numeric: moment fields undefined — including stddev (greatest()
    # ignores NULLs, so an unguarded clamp would render it 0.0)
    assert s["mean"] is None and s["min"] is None and s["max"] is None
    assert s["stddev"] is None


def test_hll_union_equals_single_shot(spark, seq_df):
    """Register-wise HLL merge: union of partition sketches == sketch of
    the union, so the merged estimate is EXACTLY the single-shot one."""
    states = column_states(seq_df, ["doc_id"], partition_col="source")
    merged = metrics_from_states(merge_states(states)).collect()[0]
    single = seq_df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("doc_id", 12)).alias("d")
    ).collect()[0]["d"]
    assert merged["approx_distinct"] == single
    # 400 distinct ids at lg_k=12: estimate within the sketch's ~2% band
    assert merged["approx_distinct"] == pytest.approx(400, rel=0.02)


def test_merge_composes_tree(spark, seq_df):
    """merge_states(merge of subsets) == merge_states(all) — the monoid
    property tree merges rely on."""
    states = column_states(seq_df, ["n_tok"], partition_col="source")
    left = merge_states(states.where(F.col("partition").isin("web", "book")))
    right = merge_states(
        states.where(~F.col("partition").isin("web", "book")))
    two_level = metrics_from_states(merge_states(left.unionByName(right)))
    one_level = metrics_from_states(merge_states(states))
    a = _metrics_map(two_level)["n_tok"]
    b = _metrics_map(one_level)["n_tok"]
    for k in ("n", "n_nonnull", "min", "max", "approx_distinct"):
        assert a[k] == b[k]
    assert a["mean"] == pytest.approx(b["mean"], rel=1e-12)


def test_incremental_skips_seen_partitions(spark, tmp_path):
    """The resume property that matters at 10^12 rows: after partitions
    are recorded, a later run neither rescans nor re-reads them — proven
    by REWRITING the old partitions' data on disk and checking the merged
    metrics still reflect the ORIGINAL states."""
    base = str(tmp_path / "tbl")
    df0 = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("day"))
    df0.write.partitionBy("day").parquet(base)

    store = StateStore(str(tmp_path / "states"))
    all1 = incremental_column_states(
        spark, spark.read.parquet(base), ["id"], "day", store)
    assert store.seen(spark) == {"0", "1"}
    m1 = _metrics_map(metrics_from_states(merge_states(all1)))["id"]
    assert m1["n"] == 1000

    # corrupt history: rewrite day=0 with a TYPE-INCOMPATIBLE id (string in
    # a bigint column) — any scan that opens those files now throws, so the
    # incremental run can only succeed if pruning skips them; append day=2
    spark.createDataFrame([("garbage",)], "id string") \
        .write.mode("overwrite").parquet(base + "/day=0")
    spark.range(1000, 1200).select(
        F.col("id"), F.lit("2").alias("day")).write.mode("append") \
        .partitionBy("day").parquet(base)

    df1 = spark.read.schema("id bigint, day string").parquet(base)
    # sanity: an unpruned scan that reads id really does hit the corruption
    with pytest.raises(Exception):
        df1.agg(F.sum("id")).collect()
    # pruning evidence: the unseen-partition filter is pushed as a
    # PARTITION filter (file-level skip), not a data filter
    from jsonschema_valid_spark.operators.states import _norm_partition
    pruned = df1.where(~_norm_partition("day").isin(["0", "1"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [NOT coalesce" in plan
    assert "DataFilters: []" in plan

    all2 = incremental_column_states(spark, df1, ["id"], "day", store)
    assert store.seen(spark) == {"0", "1", "2"}
    m2 = _metrics_map(metrics_from_states(merge_states(all2)))["id"]
    # 1000 original rows (day=0 garbage invisible: state already committed)
    # + 200 appended
    assert m2["n"] == 1200
    assert m2["min"] == 0.0 and m2["max"] == 1199.0


def test_incremental_zero_work_run(spark, tmp_path):
    base = str(tmp_path / "tbl")
    spark.range(0, 100).select(
        F.col("id"), F.lit("a").alias("p")).write.partitionBy("p") \
        .parquet(base)
    store = StateStore(str(tmp_path / "states"))
    incremental_column_states(spark, spark.read.parquet(base), ["id"],
                              "p", store)
    again = incremental_column_states(spark, spark.read.parquet(base),
                                      ["id"], "p", store)
    m = _metrics_map(metrics_from_states(merge_states(again)))["id"]
    assert m["n"] == 100  # no double counting on a no-new-partitions run


def test_null_partition_sentinel(spark):
    df = spark.createDataFrame(
        [Row(v=1, p="x"), Row(v=2, p=None), Row(v=3, p=None)])
    states = column_states(df, ["v"], partition_col="p")
    parts = {r["partition"] for r in states.select("partition").collect()}
    assert parts == {"x", "__null__"}
    m = _metrics_map(metrics_from_states(merge_states(states)))["v"]
    assert m["n"] == 3
    assert m["mean"] == pytest.approx(2.0)


def test_record_is_idempotent(spark, tmp_path, seq_df):
    store = StateStore(str(tmp_path / "states"))
    states = column_states(seq_df, ["n_tok"], partition_col="source")
    store.record(states)
    store.record(states)  # retry: overwrite, not append
    n = _metrics_map(
        metrics_from_states(merge_states(store.read_all(spark))))["n_tok"]
    assert n["n"] == 400


def test_snapshot_protocol_backend(spark, tmp_path, seq_df):
    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit
    store = StateStore(str(tmp_path / "st"),
                       protocol=SnapshotManifestCommit(str(tmp_path / "st")))
    store.record(column_states(seq_df, ["n_tok"], partition_col="source"))
    assert store.seen(spark) == {"web", "book", "code", "__null__"}
    m = _metrics_map(
        metrics_from_states(merge_states(store.read_all(spark))))["n_tok"]
    assert m["n"] == 400


def test_verdict_bridge(spark, seq_df):
    metrics = metrics_from_states(
        merge_states(column_states(seq_df, ["n_tok", "source"],
                                   partition_col="source")))
    v = stats_verdicts_from_states(metrics, {
        "n_tok": {"mean": {"min": 8.0, "max": 200.0},
                  "null_rate": {"max": 0.01},      # trips: ~7.7% null
                  "min": {"min": 0.0}},
        "source": {"null_rate": {"max": 0.5},
                   "approx_distinct": {"min": 2.0}},
    })
    rows = {r["check_id"]: r for r in v.collect()}
    assert rows["x-stats/n_tok/mean"]["passed"]
    assert not rows["x-stats/n_tok/null_rate"]["passed"]
    assert rows["x-stats/n_tok/null_rate"]["threshold"] == 0.01
    assert rows["x-stats/n_tok/min"]["passed"]
    assert rows["x-stats/source/null_rate"]["passed"]
    assert rows["x-stats/source/approx_distinct"]["passed"]
    assert len(rows) == 5


def test_verdict_bridge_missing_column_fails_loud(spark, seq_df):
    metrics = metrics_from_states(
        merge_states(column_states(seq_df, ["n_tok"],
                                   partition_col="source")))
    v = stats_verdicts_from_states(
        metrics, {"never_profiled": {"mean": {"min": 0.0}}})
    r = v.collect()[0]
    assert not r["passed"] and "never_profiled" in r["check_id"]


def test_verdict_bridge_null_metric_passes(spark):
    """Undefined metric (mean of an all-null column) ⇒ pass — the
    engine's suppression contract."""
    df = spark.createDataFrame([Row(v=None)] * 5, "v int")
    metrics = metrics_from_states(merge_states(column_states(df, ["v"])))
    v = stats_verdicts_from_states(metrics, {"v": {"mean": {"min": 1.0}}})
    assert v.collect()[0]["passed"]


def test_verdict_bridge_rejects_bad_spec(spark, seq_df):
    metrics = metrics_from_states(
        merge_states(column_states(seq_df, ["n_tok"])))
    with pytest.raises(ValueError, match="unknown state metric"):
        stats_verdicts_from_states(metrics, {"n_tok": {"median": {"min": 1}}})
    with pytest.raises(ValueError, match="min and/or max"):
        stats_verdicts_from_states(metrics, {"n_tok": {"mean": {}}})


def test_histogram_states_merge_equals_direct(spark, seq_df):
    from jsonschema_valid_spark.operators.drift import histogram, psi
    direct = {r["bucket"]: r["count"]
              for r in histogram(seq_df, "n_tok", 16.0).collect()}
    merged = {r["bucket"]: r["count"] for r in merge_histogram_states(
        histogram_states(seq_df, "n_tok", 16.0,
                         partition_col="source")).collect()}
    assert merged == direct and direct  # non-empty, bucket-for-bucket

    # merged histogram feeds the existing drift statistics unchanged:
    # PSI of the table against its own merged histogram is 0
    obs = merge_histogram_states(
        histogram_states(seq_df, "n_tok", 16.0, partition_col="source"))
    assert psi(obs, direct, spark) == pytest.approx(0.0, abs=1e-12)
