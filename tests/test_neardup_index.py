"""NearDupIndex (operators/neardup_index.py): incremental near-dup
membership — bucketed band/signature catalog, probe, idempotent extend,
fresh-session attach with sidecar-recorded MinHash parameters, and the
x-nearDup {"index": "@hist"} keyword wiring."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.neardup_index import NearDupIndex

def _text(seed: int, nwords: int = 40) -> str:
    # per-seed disjoint vocabulary: distinct docs share ZERO shingles,
    # so only the deliberately-copied texts are near-dups
    return " ".join(f"tok{seed}x{i}" for i in range(nwords))


def _hist(spark):
    rows = [(f"h{i}", _text(i)) for i in range(8)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _batch(spark):
    # b0 = exact copy of h2's text (est 1.0); b1 = h3 with one word
    # changed (high agreement); b2 = novel text (no hit)
    near = _text(3).split()
    near[20] = "changedword"
    rows = [("b0", _text(2)), ("b1", " ".join(near)), ("b2", _text(99))]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture()
def ndx(spark, tmp_path):
    idx = NearDupIndex("ndx_test", num_perm=64, bands=16, n=3, seed=42,
                       buckets=4)
    idx.build(_hist(spark), "doc_id", "text",
              bands_path=str(tmp_path / "bands"),
              sigs_path=str(tmp_path / "sigs"))
    yield idx
    spark.sql("DROP TABLE IF EXISTS ndx_test_bands")
    spark.sql("DROP TABLE IF EXISTS ndx_test_sigs")


def test_probe_finds_near_dups(spark, ndx):
    hits = ndx.probe(_batch(spark), "doc_id", "text", est_threshold=0.5)
    got = {(r["batch_id"], r["hist_id"]): r["est"] for r in hits.collect()}
    assert ("b0", "h2") in got and got[("b0", "h2")] == 1.0
    assert ("b1", "h3") in got and got[("b1", "h3")] >= 0.5
    assert not any(b == "b2" for b, _ in got)


def test_probe_index_side_exchange_free(spark, ndx):
    """At scale the catalog is too big to broadcast, and the probe joins
    must then read the index clustering from the bucket layout — the
    catalog scans stay Bucketed: true (no Exchange above them); the only
    data shuffles are the day-sized batch side's. Broadcast is disabled
    here to force the at-scale join strategy (at test size AQE would
    broadcast the catalog, which is fine but proves nothing)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ndx.probe(_batch(spark), "doc_id", "text",
                        est_threshold=0.5)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    final = plan.split("== Initial Plan ==")[0]
    scans = [ln for ln in final.splitlines()
             if "FileScan" in ln and ("ndx_test_bands" in ln
                                      or "ndx_test_sigs" in ln)]
    assert len(scans) >= 2, final
    for ln in scans:
        assert "Bucketed: true" in ln, f"catalog scan lost bucketing: {ln}"
    # all remaining shuffles belong to the batch-derived side
    data_ex = final.count("Exchange") - final.count("BroadcastExchange")
    assert data_ex <= 5, final


def test_extend_idempotent_and_probe_after(spark, ndx):
    b = _batch(spark)
    n1 = ndx.extend(b, "doc_id", "text")
    assert n1 == 3
    n2 = ndx.extend(b, "doc_id", "text")
    assert n2 == 0  # retry inserts nothing
    # after extend, the batch collides with itself in history
    hits = ndx.probe(b, "doc_id", "text", est_threshold=0.99)
    got = {(r["batch_id"], r["hist_id"]) for r in hits.collect()}
    assert ("b2", "b2") not in got  # self-matches excluded
    assert ("b0", "h2") in got
    assert spark.table("ndx_test_sigs").count() == 11


def test_collision_violations_shape(spark, ndx):
    v = ndx.collision_violations(_batch(spark), "doc_id", "text",
                                 "properties/text/x-nearDup",
                                 est_threshold=0.5)
    rows = {r["doc_id"]: r for r in v.collect()}
    assert set(rows) == {"b0", "b1"}
    assert rows["b0"]["observed"].startswith("neardup of h2, est=1")
    assert "ingested history" in rows["b0"]["expected"]


def test_attach_adopts_sidecar_params(spark, ndx, tmp_path):
    spark.sql("DROP TABLE ndx_test_bands")
    spark.sql("DROP TABLE ndx_test_sigs")
    # fresh object with WRONG defaults: attach adopts the recorded params
    fresh = NearDupIndex("ndx_test", num_perm=128, bands=32, n=2, seed=1,
                         buckets=64)
    fresh.attach(spark, str(tmp_path / "bands"), str(tmp_path / "sigs"))
    assert (fresh.num_perm, fresh.bands, fresh.n, fresh.seed,
            fresh.buckets) == (64, 16, 3, 42, 4)
    hits = fresh.probe(_batch(spark), "doc_id", "text", est_threshold=0.5)
    assert {r["batch_id"] for r in hits.collect()} == {"b0", "b1"}


def test_attach_refuses_without_sidecar(spark, tmp_path):
    d = str(tmp_path / "nometa")
    spark.range(1).select(F.lit("x").alias("id")).write.parquet(d)
    idx = NearDupIndex("ndx_nometa")
    with pytest.raises(ValueError, match="sidecar"):
        idx.attach(spark, d, d)


def test_keyword_index_form(spark, ndx):
    """x-nearDup {"index": "@hist"}: the engine reports batch-internal
    near-dups AND historical collisions in one violations DF."""
    batch = _batch(spark).unionByName(spark.createDataFrame(
        [("b9", _text(99))], "doc_id string, text string"))
    # b2 and b9 share identical novel text -> batch-internal pair;
    # b0/b1 collide with history
    suite = CheckSuite({"properties": {"text": {"x-nearDup": {
        "method": "minhash", "threshold": 0.5, "index": "@hist"}}}})
    res = suite.run(batch, key="doc_id", context={"hist": ndx})
    rows = [(r["doc_id"], r["observed"]) for r in
            res.violations.collect()]
    docs = {d for d, _ in rows}
    assert "b0" in docs and "b1" in docs          # historical collisions
    assert "b9" in docs or "b2" in docs           # internal dup non-survivor
    obs = {o for _, o in rows}
    assert any(o.startswith("neardup of ") for o in obs)
    assert any(o.startswith("duplicate of ") for o in obs)


def test_keyword_index_requires_minhash(spark, ndx):
    suite = CheckSuite({"properties": {"text": {"x-nearDup": {
        "method": "simhash", "index": "@hist"}}}})
    with pytest.raises(Exception, match="minhash"):
        suite.run(_batch(spark), key="doc_id",
                  context={"hist": ndx}).violations.collect()
