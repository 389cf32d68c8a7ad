"""Round-3 ADVICE fixes: x-unique {'approx': false} compiles to the exact
check, CheckpointRunner survives zero-work runs, the staged input copy is
invalidated when the source changes, and the eager x-rowExpr parse only
rejects genuine SQL parse errors."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.checkpoint import CheckpointRunner
from jsonschema_valid_spark.suite.spec import SuiteError


# ---------------------------------------------------------------------------
# x-unique: {'approx': false} means the EXACT check, never a silent no-op
# ---------------------------------------------------------------------------

def test_unique_approx_false_is_exact(spark):
    dup = spark.createDataFrame(
        [("k", 1), ("k", 2), ("u1", 3), ("u2", 4)], "doc_id string, x long")
    suite = CheckSuite({"properties": {"doc_id": {
        "x-unique": {"approx": False}}}})
    res = suite.run(dup, key="doc_id")
    v = res.verdicts.where(
        F.col("check_id") == "properties/doc_id/x-unique").first()
    assert v is not None, "declared uniqueness check compiled to nothing"
    assert v["passed"] is False
    # exact mode emits violation rows, unlike the sketch mode
    viol = res.violations.where(
        F.col("check_id") == "properties/doc_id/x-unique")
    assert viol.count() > 0


def test_unique_false_stays_disabled(spark):
    dup = spark.createDataFrame([("k", 1), ("k", 2)], "doc_id string, x long")
    res = CheckSuite({"properties": {"doc_id": {"x-unique": False}}}).run(
        dup, key="doc_id")
    assert res.verdicts.where(
        F.col("check_id") == "properties/doc_id/x-unique").isEmpty()


# ---------------------------------------------------------------------------
# CheckpointRunner: zero committed partitions must not crash failed()
# ---------------------------------------------------------------------------

def test_failed_with_no_committed_partitions(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id string, x long, source string")
    suite = CheckSuite({"properties": {"x": {"minimum": 0}}})
    runner = CheckpointRunner(suite, str(tmp_path / "ck"))
    summary = runner.run(empty, partition_by="source", key="doc_id")
    assert summary.processed == [] and summary.skipped == []
    # no output dirs were ever written — these must not raise
    assert runner.failed(spark) is False
    assert runner.verdicts(spark).isEmpty()
    assert runner.violations(spark).isEmpty()


# ---------------------------------------------------------------------------
# staged input invalidation: a grown source re-stages instead of silently
# validating the stale staged copy
# ---------------------------------------------------------------------------

def test_staged_input_invalidated_when_source_grows(spark, tmp_path):
    suite = CheckSuite({"properties": {"x": {"minimum": 0}}})
    base = str(tmp_path / "ck")
    df1 = spark.createDataFrame(
        [("d1", -1, "a"), ("d2", 5, "b")], "doc_id string, x long, source string")
    r = CheckpointRunner(suite, base)
    s1 = r.run(df1, partition_by="source", key="doc_id",
               stage_partitioned=True)
    assert sorted(s1.processed) == ["a", "b"]

    # the source grows: a new partition c arrives after the first run
    df2 = df1.union(spark.createDataFrame(
        [("d3", -7, "c")], "doc_id string, x long, source string"))
    s2 = r.run(df2, partition_by="source", key="doc_id",
               stage_partitioned=True)
    # old bug: the stale staged copy has no partition c ⇒ nothing processed
    assert s2.processed == ["c"], s2
    assert s2.total_rows == 1 and s2.total_violations == 1
    got = {r_["doc_id"] for r_ in r.violations(spark).collect()}
    assert got == {"d1", "d3"}


def test_staged_input_keyed_by_suite_hash(spark, tmp_path):
    """Two different suites sharing an output base never share a staged copy
    (a suite change resets lineage, so it must also reset staging)."""
    base = str(tmp_path / "ck")
    df1 = spark.createDataFrame(
        [("d1", 1, "a")], "doc_id string, x long, source string")
    df2 = spark.createDataFrame(
        [("d1", 1, "a"), ("d2", -2, "b")], "doc_id string, x long, source string")
    s_a = CheckSuite({"properties": {"x": {"minimum": 0}}})
    s_b = CheckSuite({"properties": {"x": {"maximum": 0}}})
    CheckpointRunner(s_a, base).run(df1, partition_by="source", key="doc_id",
                                    stage_partitioned=True)
    out = CheckpointRunner(s_b, base).run(
        df2, partition_by="source", key="doc_id", stage_partitioned=True)
    # suite B sees the CURRENT input (both partitions), not suite A's staging
    assert sorted(out.processed) == ["a", "b"]
    assert out.total_rows == 2


# ---------------------------------------------------------------------------
# eager x-rowExpr parse: only real ParseExceptions reject the suite
# ---------------------------------------------------------------------------

def test_rowexpr_invalid_sql_still_rejected(spark):
    with pytest.raises(SuiteError, match="invalid SQL expression"):
        CheckSuite({"x-rowExpr": "n_tok === size(("})


def test_rowexpr_environment_error_does_not_reject(spark, monkeypatch):
    """A session without a JVM handle (Spark Connect) or a broken
    getActiveSession must not be misreported as an invalid expression."""
    from pyspark.sql import SparkSession

    class _ConnectLike:
        _jsparkSession = None

    monkeypatch.setattr(SparkSession, "getActiveSession",
                        staticmethod(lambda: _ConnectLike()))
    CheckSuite({"x-rowExpr": "n_tok = size(tokens)"})  # must not raise

    def _boom():
        raise RuntimeError("no active session backend")

    monkeypatch.setattr(SparkSession, "getActiveSession",
                        staticmethod(_boom))
    CheckSuite({"x-rowExpr": "n_tok = size(tokens)"})  # must not raise


# ---------------------------------------------------------------------------
# LSH family: designed recall + portable-hash oracle modes (VERDICT r2 #1)
# ---------------------------------------------------------------------------

def test_emb_neardup_lsh_recall_vs_brute_force(spark):
    """The registered emb_neardup_lsh parameter point (bits=4, tables=16 at
    threshold 0.45) must overlap the brute-force truth — the r2 registration
    (bits=12, tables=8) had ~4% expected recall and returned 0 rows."""
    from jsonschema_valid_spark.driver_queries import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"
    lsh = {(r["a"], r["b"]) for r in q["emb_neardup_lsh"](spark, sf).collect()}
    truth = {(r["a"], r["b"]) for r in q["emb_neardup_pairs"](spark, sf).collect()}
    assert truth, "fixture lost its near-dup pairs"
    assert lsh <= truth            # exact verify ⇒ no false positives
    assert len(lsh) / len(truth) >= 0.8   # designed recall ≈ 0.956


def test_minhash_portable_matches_production_pairs(spark):
    """The portable md5 hash changes WHICH bucket a shingle lands in, not
    the math: on clearly-duplicated text both modes find the same verified
    pairs (exact Jaccard is hash-free)."""
    from jsonschema_valid_spark.functions.dedup import minhash_lsh_pairs

    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely unrelated text about spark dataframes and joins"),
            (4, "the quick brown fox jumps over the lazy dog today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_perm=64, bands=16, n=2, threshold=0.5)
    prod = {(r["a"], r["b"]) for r in
            minhash_lsh_pairs(df, "doc_id", "text", **kw).collect()}
    port = {(r["a"], r["b"]) for r in
            minhash_lsh_pairs(df, "doc_id", "text", portable=True, **kw).collect()}
    assert prod == port
    assert (1, 4) in prod and (1, 2) in prod
    assert not any(3 in p for p in prod)


def test_simhash_portable_matches_production_pairs(spark):
    from jsonschema_valid_spark.functions.dedup import simhash_pairs

    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "totally different words nothing shared at all here folks")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prod = {(r["a"], r["b"], r["hamming"]) for r in
            simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()}
    port = {(r["a"], r["b"], r["hamming"]) for r in
            simhash_pairs(df, "doc_id", "text", max_hamming=3,
                          portable=True).collect()}
    # identical texts: hamming 0 in BOTH hash modes; disjoint text: absent
    assert (1, 2, 0) in prod and (1, 2, 0) in port
    assert not any(3 in (a, b) for a, b, _ in prod | port)


def test_fingerprint_portable_equality_semantics(spark):
    """Equal normalized texts ⇒ equal fingerprints in both hash modes."""
    from jsonschema_valid_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other text")],
        "id long, text string")
    for portable in (False, True):
        fps = {r["id"]: r["fp"] for r in df.select(
            "id", fingerprint(F.col("text"), portable=portable).alias("fp")
        ).collect()}
        assert fps[1] != fps[3]
        # same words, same order (whitespace-split + lower normalizes case)
        assert fps[1] == fps[2]


# ---------------------------------------------------------------------------
# exact `format: regex` (VERDICT r2 #3) — vectors matching Regex::new
# (format.rs:51-53): compile probe + Rust-compat pre-filter
# ---------------------------------------------------------------------------

def test_format_regex_exact_vectors(spark):
    vectors = [
        ("a+b*", True),
        ("[a-z]{2,3}", True),
        (r"^\d{4}$", True),
        ("(?i)case", True),          # inline flags: valid in both engines
        ("a{2,1}", False),           # reversed interval
        ("(?P<)", False),            # unterminated group name
        ("(unclosed", False),
        ("x**", False),              # multiple repeat
        ("[z-a]", False),            # bad character range
        ("(?=look)ahead", False),    # Rust regex has no lookaround
        (r"(a)\1", False),           # Rust regex has no backreferences
        (None, True),                # null: absent value passes the check
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(vectors)], "id long, p string")
    res = CheckSuite({"properties": {"p": {"format": "regex"}}}).run(
        df, key="id")
    failed = {int(r["doc_id"]) for r in res.violations.collect()}
    expect_failed = {i for i, (_, ok) in enumerate(vectors) if not ok}
    assert failed == expect_failed


def test_format_regex_fixed_old_approximation(spark):
    """The r2 structural rlike called `a{2,1}` valid and could reject valid
    patterns with literal backslashes; the probe gets both right."""
    df = spark.createDataFrame(
        [(0, "a{2,1}"), (1, r"foo\.bar")], "id long, p string")
    res = CheckSuite({"properties": {"p": {"format": "regex"}}}).run(
        df, key="id")
    failed = {int(r["doc_id"]) for r in res.violations.collect()}
    assert failed == {0}


# ---------------------------------------------------------------------------
# commit-protocol seam (VERDICT r2 #7): resume runs against BOTH the parquet
# dynamic-overwrite path and the Iceberg-style atomic snapshot-manifest path
# ---------------------------------------------------------------------------

def _ckpt_suite():
    return CheckSuite({"properties": {"x": {"minimum": 0}}})


def _ckpt_input(spark):
    rows = [(f"d{i}", -1 if i % 5 == 0 else i, f"p{i % 3}")
            for i in range(30)]
    return spark.createDataFrame(rows, "doc_id string, x long, source string")


@pytest.mark.parametrize("seam", ["parquet", "iceberg"])
def test_resume_contract_under_both_commit_seams(spark, tmp_path, seam):
    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit

    df = _ckpt_input(spark)
    base = str(tmp_path / seam)
    proto = SnapshotManifestCommit(base) if seam == "iceberg" else None
    runner = CheckpointRunner(_ckpt_suite(), base, commit_protocol=proto)

    # interrupted after 1 partition, then resumed — same lineage contract
    with pytest.raises(InterruptedError):
        runner.run(df, partition_by="source", key="doc_id", fail_after=1)
    done_first = runner.completed_partitions(spark)
    assert len(done_first) == 1

    s2 = runner.run(df, partition_by="source", key="doc_id")
    assert sorted(s2.processed + s2.skipped) == ["p0", "p1", "p2"]
    assert sorted(s2.skipped) == sorted(done_first)

    viol = {r["doc_id"] for r in runner.violations(spark).collect()}
    assert viol == {f"d{i}" for i in range(30) if i % 5 == 0}
    assert runner.failed(spark) is True
    # re-running a completed partition is a no-op (lineage prunes it)
    s3 = runner.run(df, partition_by="source", key="doc_id")
    assert s3.processed == []


def test_snapshot_seam_crash_before_swap_invisible(spark, tmp_path):
    """Iceberg contract: data files written but NOT manifest-swapped are
    invisible to readers — a crash between write and commit can never
    expose a partial partition."""
    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit

    base = str(tmp_path / "snap")
    proto = SnapshotManifestCommit(base)
    df1 = spark.createDataFrame([("a", 1)], "doc_id string, x long")
    proto.commit(df1, "violations", "p0")
    assert proto.read_all(spark, "violations").count() == 1

    # simulate the crash: write data files directly, no manifest swap
    df2 = spark.createDataFrame([("b", 2)], "doc_id string, x long")
    df2.write.parquet(f"{base}/violations/data/p1-crashed")
    assert proto.read_all(spark, "violations").count() == 1  # still old view

    # a re-commit of p0 atomically REPLACES its file set
    df3 = spark.createDataFrame([("c", 3), ("d", 4)], "doc_id string, x long")
    proto.commit(df3, "violations", "p0")
    got = {r["doc_id"] for r in proto.read_all(spark, "violations").collect()}
    assert got == {"c", "d"}


# ---------------------------------------------------------------------------
# IVF-Flat ANN (second scale path beside LSH)
# ---------------------------------------------------------------------------

def test_ivf_topk_recall_vs_brute_force(spark):
    import random

    from jsonschema_valid_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rnd = random.Random(5)
    rows = [(i, [rnd.gauss(0.0, 1.0) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = rows[7][1]

    exact = [r["vec_id"] for r in
             brute_force_topk(df, "vec_id", "v", q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(df, "vec_id", "v", q, k=10, n_cells=8,
                       n_probe=4).collect()]
    # probing half the cells recovers most of the exact top-10, and the
    # query point itself (cos 1.0) is always in its own probed cell
    assert approx[0] == 7
    assert len(set(approx) & set(exact)) >= 6

    full = [r["vec_id"] for r in
            ivf_topk(df, "vec_id", "v", q, k=10, n_cells=8,
                     n_probe=8).collect()]
    assert full == exact  # probing every cell IS the exact search


# ---------------------------------------------------------------------------
# CLI: --check-suite (engine-hosted metaschema) and --commit-protocol
# ---------------------------------------------------------------------------

def test_cli_check_suite(spark, tmp_path):
    import json

    from jsonschema_valid_spark.cli import main

    good = tmp_path / "good.json"
    good.write_text(json.dumps({"properties": {"x": {"minimum": 0}}}))
    assert main(["--suite", str(good), "--input", "unused",
                 "--output", "unused", "--check-suite"]) == 0

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"properties": {"x": {"minimum": "zero"}}}))
    assert main(["--suite", str(bad), "--input", "unused",
                 "--output", "unused", "--check-suite"]) == 1


def test_cli_resume_snapshot_protocol(spark, tmp_path):
    import json

    from jsonschema_valid_spark.cli import main

    p = tmp_path / "in.parquet"
    _ckpt_input(spark).write.parquet(str(p))
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps({"properties": {"x": {"minimum": 0}}}))
    out = str(tmp_path / "out")
    rc = main(["--suite", str(suite_path), "--input", str(p),
               "--output", out, "--resume", "--partition-by", "source",
               "--commit-protocol", "snapshot"])
    assert rc == 1  # the %5 rows violate
    # outputs are visible only through the manifest
    import os

    assert os.path.exists(f"{out}/violations/_manifest.json")
    # second invocation: everything skipped, exit still reflects history
    rc2 = main(["--suite", str(suite_path), "--input", str(p),
                "--output", out, "--resume", "--partition-by", "source",
                "--commit-protocol", "snapshot"])
    assert rc2 == 1


# ---------------------------------------------------------------------------
# x-decontamination dataset keyword (late round 3)
# ---------------------------------------------------------------------------

def _decontam_fixture(spark):
    bench = spark.createDataFrame(
        [("the secret benchmark answer is forty two exactly",)],
        "text: string")
    docs = spark.createDataFrame(
        [(1, "a clean document about spark joins and shuffles here"),
         (2, "leaked: the secret benchmark answer is forty two exactly wow"),
         (3, "another clean one with plenty of ordinary words inside")],
        "doc_id: long, text: string")
    spec = {"properties": {"text": {
        "type": "string",
        "x-decontamination": {"benchmark": "@bench", "n": 5}}}}
    return bench, docs, spec


def test_x_decontamination_keyword(spark):
    from jsonschema_valid_spark import CheckSuite

    bench, docs, spec = _decontam_fixture(spark)
    res = CheckSuite(spec).run(docs, key="doc_id", context={"bench": bench})
    assert res.ok() is False
    viols = res.violations.collect()
    assert {(r["doc_id"], r["check_id"]) for r in viols} == {
        ("2", "properties/text/x-decontamination")}
    verdict = {(r["check_id"], r["passed"]) for r in res.verdicts.collect()}
    assert ("properties/text/x-decontamination", False) in verdict


def test_x_decontamination_summarized_path_agrees(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.engine import run_suite_summarized

    bench, docs, spec = _decontam_fixture(spark)
    suite = CheckSuite(spec)
    res = run_suite_summarized(suite, docs, key="doc_id",
                               context={"bench": bench})
    assert {(r["doc_id"], r["check_id"]) for r in res.violations.collect()} \
        == {("2", "properties/text/x-decontamination")}
    assert res.ok() is False


def test_x_decontamination_spec_validation(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    good = {"properties": {"text": {
        "x-decontamination": {"benchmark": "@bench", "maxRatio": 0.1}}}}
    validate_suite_spec(good)
    assert validate_suite_with_engine(spark, good).ok() is True

    bad = {"properties": {"text": {"x-decontamination": {"n": 5}}}}
    import pytest as _pytest
    with _pytest.raises(SuiteError):
        validate_suite_spec(bad)
    assert validate_suite_with_engine(spark, bad).ok() is False


# ---------------------------------------------------------------------------
# x-blocklist row-scope keyword (late round 3)
# ---------------------------------------------------------------------------

def test_x_blocklist_keyword(spark):
    from jsonschema_valid_spark import CheckSuite

    docs = spark.createDataFrame(
        [(1, "totally clean content"),
         (2, "contains the badword here"),
         (3, None)],
        "doc_id: long, text: string")
    suite = CheckSuite({"properties": {"text": {
        "x-blocklist": {"terms": ["badword", "otherbad"]}}}})
    res = suite.run(docs, key="doc_id")
    viols = res.violations.collect()
    assert {(r["doc_id"], r["check_id"]) for r in viols} == {
        ("2", "properties/text/x-blocklist")}
    assert viols[0]["observed"] == "1"
    assert res.ok() is False
    # null text is tolerated (value-check null semantics)
    assert "3" not in {r["doc_id"] for r in viols}
    # maxHits loosens the gate
    ok = CheckSuite({"properties": {"text": {
        "x-blocklist": {"terms": ["badword"], "maxHits": 1}}}}).run(
        docs, key="doc_id")
    assert ok.ok() is True


def test_x_blocklist_spec_validation(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    good = {"properties": {"text": {"x-blocklist": {"terms": ["a b"]}}}}
    validate_suite_spec(good)
    assert validate_suite_with_engine(spark, good).ok() is True
    bad = {"properties": {"text": {"x-blocklist": {"terms": []}}}}
    import pytest as _pytest
    with _pytest.raises(SuiteError):
        validate_suite_spec(bad)
    assert validate_suite_with_engine(spark, bad).ok() is False
