"""Semantic decontamination (functions/decontamination.py
semantic_contamination / semantic_decontaminate): embedding-space
benchmark overlap — the paraphrase channel n-gram overlap misses."""

from pyspark.sql import functions as F

from jsonschema_valid_spark.functions.decontamination import (
    semantic_contamination,
    semantic_decontaminate,
)


def _fixture(spark):
    """4-dim toy space: corpus doc 1 IS the benchmark item (leaked),
    doc 2 is a near-paraphrase of bench 20, docs 3-4 are orthogonal."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [0.0, 1.0, 0.1, 0.0]),
         (3, [0.0, 0.0, 0.0, 1.0]),
         (4, [0.0, 0.0, 1.0, 0.0])],
        "vec_id: long, embedding: array<double>")
    bench = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]),     # verbatim leak of doc 1
         (20, [0.0, 1.0, 0.0, 0.0])],    # paraphrase target of doc 2
        "vec_id: long, embedding: array<double>")
    return corpus, bench


def test_contamination_flags_and_ranks(spark):
    corpus, bench = _fixture(spark)
    out = semantic_contamination(corpus, bench, key="vec_id",
                                 vec_col="embedding", dim=4,
                                 threshold=0.9, n_cells=4, n_assign=4)
    got = {r["vec_id"]: (r["bench_id"], round(r["cos"], 4))
           for r in out.collect()}
    # doc 1 hits bench 10 at cos 1.0; doc 2 hits bench 20 at ~0.995
    assert got[1] == (10, 1.0)
    assert got[2][0] == 20 and got[2][1] > 0.99
    assert set(got) == {1, 2}


def test_decontaminate_drops_flagged(spark):
    corpus, bench = _fixture(spark)
    kept = semantic_decontaminate(corpus, bench, key="vec_id",
                                  vec_col="embedding", dim=4,
                                  threshold=0.9, n_cells=4, n_assign=4)
    assert sorted(r["vec_id"] for r in kept.collect()) == [3, 4]


def test_max_rollup_tiebreak_deterministic(spark):
    """Two benchmark items at the SAME cosine to one doc: the larger
    bench id wins (max(struct)) — partitioning-invariant."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id: long, embedding: array<double>")
    bench = spark.createDataFrame(
        [(10, [2.0, 0.0, 0.0, 0.0]), (30, [3.0, 0.0, 0.0, 0.0])],
        "vec_id: long, embedding: array<double>")
    out = semantic_contamination(corpus, bench, key="vec_id",
                                 vec_col="embedding", dim=4,
                                 threshold=0.9, n_cells=4, n_assign=4)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["bench_id"] == 30


def test_corpus_never_shuffled_before_rollup(spark):
    """Plan contract: ONE Exchange total (the final per-doc aggregate);
    the benchmark meets the corpus in a broadcast hash join."""
    corpus, bench = _fixture(spark)
    out = semantic_contamination(corpus, bench, key="vec_id",
                                 vec_col="embedding", dim=4,
                                 threshold=0.9, n_cells=4, n_assign=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # partial+final agg = at most one real Exchange besides broadcasts
    import re
    non_bcast = [m for m in re.findall(r"Exchange \w+", plan)
                 if "Broadcast" not in m]
    assert len(non_bcast) <= 1, plan


def test_fuzzy_contamination_edited_leak(spark):
    """Lightly-edited verbatim leak: caught by shingle Jaccard with the
    corpus never shuffled before the rollup."""
    from jsonschema_valid_spark.functions.decontamination import (
        fuzzy_contamination,
    )

    words = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1, words),
         (2, "completely different text about other things entirely"),
         (3, " ".join(f"x{i}" for i in range(30)))],
        "doc_id: long, text: string")
    # bench 10 = doc 1 with the first word dropped; bench 20 = unrelated
    bench = spark.createDataFrame(
        [(10, " ".join(f"w{i}" for i in range(1, 30))),
         (20, "totally unrelated benchmark question")],
        "doc_id: long, text: string")
    out = fuzzy_contamination(corpus, bench, key="doc_id",
                              text_col="text", n=2, threshold=0.8)
    rows = [(r["doc_id"], r["bench_id"], round(r["jaccard"], 3))
            for r in out.collect()]
    assert len(rows) == 1
    assert rows[0][0] == 1 and rows[0][1] == 10 and rows[0][2] > 0.9

    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both plans
    assert "BroadcastHashJoin" in final and "SortMergeJoin" not in final
    import re
    non_bcast = [m for m in re.findall(r"Exchange \w+", final)
                 if "Broadcast" not in m]
    assert len(non_bcast) <= 1, final


def test_keyword_three_methods(spark):
    """One declarative keyword, three channels: ngram / fuzzy / semantic
    each flag their own leak style through BOTH run paths."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.engine import run_suite_summarized
    from jsonschema_valid_spark.suite.spec import SuiteError, \
        validate_suite_spec

    words = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, words), (2, "nothing in common here at all whatsoever")],
        "doc_id: long, text: string")
    bench_txt = spark.createDataFrame(
        [(10, " ".join(f"w{i}" for i in range(1, 30)))],
        "doc_id: long, text: string")

    for method, extra in [("ngram", {"n": 3}),
                          ("fuzzy", {"threshold": 0.8, "n": 2})]:
        spec = {"properties": {"text": {"x-decontamination": dict(
            {"benchmark": "@bench", "method": method}, **extra)}}}
        if method == "ngram":
            del spec["properties"]["text"]["x-decontamination"]["method"]
        res = CheckSuite(spec).run(docs, key="doc_id",
                                   context={"bench": bench_txt})
        assert [r["doc_id"] for r in res.violations.collect()] == ["1"], \
            method
        summ = run_suite_summarized(CheckSuite(spec), docs, key="doc_id",
                                    context={"bench": bench_txt})
        assert [r["doc_id"] for r in summ.violations.collect()] == ["1"], \
            method

    vdocs, vbench = _fixture(spark)
    spec = {"properties": {"embedding": {"x-decontamination": {
        "benchmark": "@bench", "method": "semantic", "threshold": 0.9,
        "dim": 4, "nCells": 4, "nAssign": 4}}}}
    res = CheckSuite(spec).run(vdocs, key="vec_id",
                               context={"bench": vbench})
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert set(got) == {"1", "2"}
    assert got["1"].startswith("cosine=1.0 vs 10")

    import pytest as _pt
    with _pt.raises(SuiteError):
        validate_suite_spec({"properties": {"text": {
            "x-decontamination": {"benchmark": "@b", "method": "vector"}}}})


def test_bloom_contamination_flags_batch_and_stream(spark, tmp_path):
    """The stateless Bloom probe matches the exact operator on clean and
    leaked docs (m sized for ~0 FPR here), and the SAME call runs on a
    stream."""
    import time

    from jsonschema_valid_spark.functions.decontamination import (
        bloom_contamination_flags,
        contamination,
    )

    words = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, words),
         (2, "nothing shared here at all in any way truly")],
        "doc_id: long, text: string")
    bench = spark.createDataFrame(
        [(10, words)], "doc_id: long, text: string")

    out = bloom_contamination_flags(docs, bench, "text", n=3,
                                    m_bits=1 << 16)
    got = {r["doc_id"]: (r["contamination_ratio"], r["contaminated"])
           for r in out.collect()}
    assert got[1] == (1.0, True) and got[2] == (0.0, False)
    # parity with the exact rollup operator on the flagged doc
    exact = {r["doc_id"]: r["contamination_ratio"]
             for r in contamination(docs, bench, "doc_id", "text",
                                    n=3).collect()}
    assert exact == {1: 1.0}

    # the identical call on a STREAM (stateless: no watermark needed)
    path = str(tmp_path / "in")
    docs.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)
    sdf = (spark.readStream.schema("doc_id long, text string")
           .parquet(path))
    sout = bloom_contamination_flags(sdf, bench, "text", n=3,
                                     m_bits=1 << 16)
    q = (sout.select("doc_id", "contaminated")
         .writeStream.format("memory").queryName("bloomc_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    srows = {r["doc_id"]: r["contaminated"]
             for r in spark.sql("select * from bloomc_sink").collect()}
    assert srows == {1: True, 2: False}
