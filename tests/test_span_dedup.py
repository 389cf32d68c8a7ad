"""Substring-level exact dedup: winnowing fingerprints + cross-document
duplicated-span pairs (functions/dedup.py kgram_hashes /
winnow_from_hashes / duplicate_span_pairs)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.functions.dedup import (
    duplicate_span_pairs,
    kgram_hashes,
    winnow_fingerprints,
)

K, W = 8, 8
GUARANTEE = W + K - 1  # any common substring this long shares a fingerprint

BOILER = "zqxwvutsrqponmlkj"  # 17 chars >= guarantee, unique alphabet
assert len(BOILER) >= GUARANTEE


def _docs(spark):
    rows = [
        (1, "first document body " + BOILER + " trailing words here"),
        (2, "totally other opening text then " + BOILER + " and more"),
        (3, "nothing in common with anybody else at all in this one"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_planted_span_detected_with_positions(spark):
    df = _docs(spark)
    out = {(r["a"], r["b"]): r
           for r in duplicate_span_pairs(df, "doc_id", "text",
                                         k=K, w=W).collect()}
    assert (1, 2) in out and len(out) == 1
    r = out[(1, 2)]
    texts = {x["doc_id"]: x["text"] for x in df.collect()}
    # reported positions address the SAME k-gram in both documents
    assert (texts[1][r["pos_a"] - 1:r["pos_a"] - 1 + K]
            == texts[2][r["pos_b"] - 1:r["pos_b"] - 1 + K])
    # the witness gram lies inside the planted span (the winnowed minimum
    # need not sit at the span's first character)
    start = texts[1].index(BOILER)
    assert start <= r["pos_a"] - 1 <= start + len(BOILER) - K


def test_short_common_substring_not_required(spark):
    # only a 7-char overlap (< guarantee): detection not guaranteed AND
    # no false pair may be fabricated from it at min_shared=1 with k=8
    rows = [(1, "aaaaaaa bcdefgh one"), (2, "zzzzzzz bcdefg two")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = duplicate_span_pairs(df, "doc_id", "text", k=K, w=W).collect()
    assert out == []


def test_min_shared_thresholds(spark):
    df = _docs(spark)
    assert duplicate_span_pairs(df, "doc_id", "text", k=K, w=W,
                                min_shared=50).collect() == []


def test_doc_freq_cap_drops_boilerplate(spark):
    # BOILER in every doc: df-cap 2 removes its fingerprints entirely
    rows = [(i, f"doc {i} unique words here " + BOILER) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    uncapped = duplicate_span_pairs(df, "doc_id", "text", k=K, w=W)
    assert uncapped.count() == 6  # all 4C2 pairs share the boilerplate
    capped = duplicate_span_pairs(df, "doc_id", "text", k=K, w=W,
                                  max_doc_freq=2)
    assert capped.count() == 0


def test_portable_and_default_agree_on_pairs(spark):
    df = _docs(spark)
    a = {(r["a"], r["b"]) for r in duplicate_span_pairs(
        df, "doc_id", "text", k=K, w=W).collect()}
    b = {(r["a"], r["b"]) for r in duplicate_span_pairs(
        df, "doc_id", "text", k=K, w=W, portable=True).collect()}
    assert a == b == {(1, 2)}


def test_winnow_density_bound(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i % 97}" for i in range(200)))],
        "doc_id: long, text: string")
    row = docs.select(
        F.size(kgram_hashes(F.col("text"), K)).alias("n_h"),
        F.size(winnow_fingerprints(F.col("text"), K, W)).alias("n_fp"),
    ).collect()[0]
    # winnowing density ~2/(w+1); distinct-ing only lowers it. Allow 3x.
    assert row["n_fp"] <= row["n_h"] * 3.0 / (W + 1)
    assert row["n_fp"] >= 1


def test_identical_documents_share_everything(spark):
    text = "the exact same content repeated verbatim in both documents"
    df = spark.createDataFrame([(1, text), (2, text)],
                               "doc_id: long, text: string")
    out = duplicate_span_pairs(df, "doc_id", "text", k=K, w=W).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pos_a"] == r["pos_b"]
    fp = df.select(F.size(winnow_fingerprints(F.col("text"), K, W))
                   .alias("n")).collect()[0]["n"]
    assert r["shared"] == fp  # every fingerprint shared


def test_candidate_join_not_cartesian(spark):
    df = _docs(spark)
    plan = duplicate_span_pairs(
        df, "doc_id", "text", k=K, w=W
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
