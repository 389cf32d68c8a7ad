"""CLI + JSONL-source tests (deploy surface: spark-submit entry)."""

import json

import pytest

SUITE = {
    "version": 7,
    "required": ["doc_id"],
    "properties": {
        "doc_id": {"type": "string"},
        "n_tok": {"type": "integer", "minimum": 1},
        "tokens": {"type": "array", "items": {"type": "integer", "minimum": 0}},
        "source": {"type": "string"},
    },
    "x-rowExpr": "n_tok = size(tokens)",
}


def test_suite_to_spark_schema():
    from pyspark.sql import types as T

    from jsonschema_valid_spark.sources.jsonl import suite_to_spark_schema

    schema = suite_to_spark_schema(SUITE)
    assert schema["doc_id"].dataType == T.StringType()
    assert schema["n_tok"].dataType == T.LongType()
    assert schema["tokens"].dataType == T.ArrayType(T.LongType())


@pytest.fixture()
def jsonl_path(tmp_path):
    rows = [
        {"doc_id": "a", "n_tok": 2, "tokens": [1, 2], "source": "web"},
        {"doc_id": "b", "n_tok": 3, "tokens": [1, 2], "source": "web"},  # invariant
        {"doc_id": "c", "n_tok": 1, "tokens": [-5], "source": "web"},    # range
        {"n_tok": 1, "tokens": [1], "source": "web"},                     # no doc_id
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_read_jsonl_and_validate(spark, jsonl_path):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.sources.jsonl import read_jsonl

    df = read_jsonl(spark, jsonl_path, SUITE)
    res = CheckSuite(SUITE).run(df, key="doc_id")
    got = {(r["doc_id"], r["check_id"]) for r in res.violations.collect()}
    assert ("b", "x-rowExpr") in got
    assert ("c", "properties/tokens/items") in got
    assert any(cid == "required/doc_id" for _, cid in got)


def test_cli_end_to_end(spark, tmp_path, jsonl_path):
    from jsonschema_valid_spark.cli import main

    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(SUITE))
    out = tmp_path / "out"

    rc = main(["--suite", str(suite_path), "--input", jsonl_path,
               "--format", "jsonl", "--output", str(out)])
    assert rc == 1  # corrupt input → nonzero exit
    viol = spark.read.parquet(f"{out}/violations")
    assert viol.count() >= 3

    # fail-fast probe path
    rc2 = main(["--suite", str(suite_path), "--input", jsonl_path,
                "--format", "jsonl", "--output", str(out), "--fail-fast"])
    assert rc2 == 1


def test_cli_clean_input_exits_zero(spark, tmp_path):
    from jsonschema_valid_spark.cli import main

    rows = [{"doc_id": "a", "n_tok": 1, "tokens": [5], "source": "web"}]
    p = tmp_path / "clean.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(SUITE))
    rc = main(["--suite", str(suite_path), "--input", str(p),
               "--format", "jsonl", "--output", str(tmp_path / "o2")])
    assert rc == 0


def test_validate_documents_helper(spark):
    """validate_documents ≙ the reference's validate(instance, schema)
    (lib.rs:84-102) — in-memory docs through the same compiled plan."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.sources.jsonl import validate_documents

    suite = CheckSuite({
        "required": ["name"],
        "properties": {"name": {"minLength": 2},
                       "age": {"minimum": 0}},
    })
    res = validate_documents(spark, [
        {"name": "ok", "age": 3},
        {"name": "x", "age": -1},
        {"age": 5},
    ], suite)
    got = {(r["doc_id"], r["check_id"]) for r in res.violations.collect()}
    assert got == {("1", "properties/name/minLength"),
                   ("1", "properties/age/minimum"),
                   ("2", "required/name")}


def test_cli_explain_prints_plans_without_running(spark, tmp_path, capsys):
    import json

    from jsonschema_valid_spark.cli import main

    p = tmp_path / "clean.parquet"
    spark.createDataFrame([(1, 5), (2, 6)], "doc_id: long, n: long") \
        .write.parquet(str(p))
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(
        {"properties": {"n": {"minimum": 0, "x-stats": {"avg": {"max": 10}}}}}))
    rc = main(["--suite", str(suite_path), "--input", str(p),
               "--format", "parquet", "--key", "doc_id",
               "--output", str(tmp_path / "out"), "--explain"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "== violations plan ==" in out and "== verdicts plan ==" in out
    assert "Physical Plan" in out
    # nothing was written: explain must not execute the job
    import os
    assert not os.path.exists(tmp_path / "out")


def test_cli_exemplars_caps_written_violations(spark, tmp_path):
    from jsonschema_valid_spark.cli import main

    rows = [{"doc_id": f"d{i:03d}", "n_tok": 1, "tokens": [-1],
             "source": "web"} for i in range(30)]  # 30 range violations
    p = tmp_path / "bad.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(SUITE))
    out = tmp_path / "out_ex"

    rc = main(["--suite", str(suite_path), "--input", str(p),
               "--format", "jsonl", "--output", str(out),
               "--exemplars", "5"])
    assert rc == 1
    viol = spark.read.parquet(f"{out}/violations")
    per = {r["check_id"]: r["n"] for r in
           viol.groupBy("check_id").count().withColumnRenamed(
               "count", "n").collect()}
    assert all(n <= 5 for n in per.values()) and per
    assert "exemplar_rank" in viol.columns


def test_cli_csv_quarantine_and_report(spark, tmp_path):
    from jsonschema_valid_spark.cli import main

    spec = {"properties": {
        "doc_id": {"type": "string"},
        "n_tok": {"type": "integer", "minimum": 1},
    }}
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(spec))
    csv = tmp_path / "in.csv"
    csv.write_text("doc_id,n_tok\na,10\nb,zz\nc,0\n")
    out = tmp_path / "out"
    rep = tmp_path / "report.md"

    rc = main(["--suite", str(suite_path), "--input", str(csv),
               "--format", "csv", "--key", "doc_id",
               "--output", str(out), "--report", str(rep)])
    assert rc == 1  # one violation (c) + one quarantined line (b)
    quar = spark.read.parquet(str(out / "quarantine")).collect()
    assert [r["_corrupt_record"] for r in quar] == ["b,zz"]
    viol = spark.read.parquet(str(out / "violations")).collect()
    assert [r["doc_id"] for r in viol] == ["c"]
    text = rep.read_text()
    assert text.startswith("# Validation report")
    assert "**Status: FAILED**" in text

    clean_csv = tmp_path / "ok.csv"
    clean_csv.write_text("doc_id,n_tok\na,10\nc,3\n")
    rc2 = main(["--suite", str(suite_path), "--input", str(clean_csv),
                "--format", "csv", "--key", "doc_id",
                "--output", str(tmp_path / "out2")])
    assert rc2 == 0


def test_cli_suggest_suite_bootstrap(spark, tmp_path):
    """--suggest-suite profiles the input, writes a runnable CheckSuite,
    and that suite validates the profiled table cleanly end-to-end."""
    from jsonschema_valid_spark.cli import main
    from tests.conftest import SF_DIR

    suite_path = tmp_path / "suggested.json"
    rc = main(["--input", f"{SF_DIR}/documents.parquet",
               "--key", "doc_id", "--suggest-suite", str(suite_path)])
    assert rc == 0
    spec = json.loads(suite_path.read_text())
    assert spec["properties"]["doc_id"].get("x-unique") is True

    out = tmp_path / "out"
    rc2 = main(["--suite", str(suite_path),
                "--input", f"{SF_DIR}/documents.parquet",
                "--key", "doc_id", "--output", str(out)])
    assert rc2 == 0  # the bootstrapped suite passes on its own snapshot

    # jsonl input refused (circular: parsing needs a spec)
    assert main(["--input", "x.jsonl", "--format", "jsonl",
                 "--suggest-suite", str(suite_path)]) == 2


def test_cli_resume_snapshot_vacuum(spark, tmp_path):
    """--vacuum-age with the snapshot protocol: a crash-orphaned staging
    dir is expired after the resume run; the run's own snapshots stay."""
    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit
    from jsonschema_valid_spark.cli import main
    from tests.conftest import SF_DIR

    spec = {"properties": {"doc_id": {"type": "integer"}}}
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(spec))
    out = tmp_path / "out"

    # plant an orphan as if a previous run crashed between stage/publish
    proto = SnapshotManifestCommit(str(out))
    orphan = proto.stage(
        spark.range(3).selectExpr("id AS doc_id"), "violations", "zz")

    rc = main(["--suite", str(suite_path),
               "--input", f"{SF_DIR}/documents.parquet",
               "--key", "doc_id", "--partition-by", "source",
               "--output", str(out), "--resume",
               "--commit-protocol", "snapshot", "--vacuum-age", "0"])
    assert rc == 0
    import os
    assert not os.path.isdir(orphan)
    # committed results still readable through the manifest
    assert proto.read_all(spark, "verdicts").count() > 0


def test_cli_orc_roundtrip(spark, tmp_path):
    """ORC input: full validate run and suggest-suite bootstrap both work
    on the columnar sibling format."""
    from jsonschema_valid_spark.cli import main

    src = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 7)], "doc_id: long, n_tok: long")
    orc_path = str(tmp_path / "in_orc")
    src.write.orc(orc_path)

    spec = {"properties": {"n_tok": {"minimum": 1}}}
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(spec))
    rc = main(["--suite", str(suite_path), "--input", orc_path,
               "--format", "orc", "--key", "doc_id",
               "--output", str(tmp_path / "out")])
    assert rc == 1  # doc 2 violates minimum
    viol = spark.read.parquet(str(tmp_path / "out" / "violations")).collect()
    assert [r["doc_id"] for r in viol] == ["2"]

    sugg = tmp_path / "sugg.json"
    assert main(["--input", orc_path, "--format", "orc", "--key", "doc_id",
                 "--suggest-suite", str(sugg)]) == 0
    assert "n_tok" in json.loads(sugg.read_text())["properties"]


def test_cli_verify_content_resume(spark, tmp_path):
    """--verify-content: the CLI resume revalidates a partition whose
    data changed after its first validation and reports it."""
    from jsonschema_valid_spark.cli import main

    spec = {"properties": {"v": {"minimum": 0}}}
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(spec))
    in_path = str(tmp_path / "in")
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 6)], "doc_id: long, src: string, v: long")
    df.write.parquet(in_path)

    base_args = ["--suite", str(suite_path), "--input", in_path,
                 "--key", "doc_id", "--partition-by", "src",
                 "--output", out, "--resume", "--verify-content"]
    assert main(base_args) == 0

    spark.createDataFrame([(9, "a", -3)], df.schema) \
        .write.mode("append").parquet(in_path)
    rc = main(base_args)
    assert rc == 1  # the appended row violates
    from jsonschema_valid_spark.checkpoint import CheckpointRunner
    from jsonschema_valid_spark import CheckSuite
    r = CheckpointRunner(CheckSuite(spec), out)
    assert [v["doc_id"] for v in r.violations(spark).collect()] == ["9"]


def test_cli_audit_schema_preflight(spark, tmp_path, capsys):
    """--audit-schema: pre-flight gap report (operators/schema_audit.py)
    as JSON, exit 1 on failing statuses, no run output written."""
    import json as _json

    from jsonschema_valid_spark.cli import main

    spark.createDataFrame([(1, "x")], "doc_id bigint, extra string") \
        .write.mode("overwrite").parquet(str(tmp_path / "in"))
    suite_path = tmp_path / "audit_suite.json"
    suite_path.write_text(_json.dumps({
        "additionalProperties": False,
        "required": ["doc_id", "text"],
        "properties": {"doc_id": {"type": "integer"},
                       "text": {"type": "string"}},
    }))
    rc = main(["--suite", str(suite_path), "--input", str(tmp_path / "in"),
               "--output", str(tmp_path / "out"), "--audit-schema"])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and rep["schema_ok"] is False
    statuses = {(r["column"], r["status"]) for r in rep["report"]}
    assert ("text", "missing_required") in statuses
    assert ("extra", "undeclared") in statuses
    assert not (tmp_path / "out").exists()  # audit never runs the suite

    # clean contract -> exit 0
    suite_path.write_text(_json.dumps(
        {"properties": {"doc_id": {"type": "integer"},
                        "extra": {"type": "string"}}}))
    rc2 = main(["--suite", str(suite_path), "--input", str(tmp_path / "in"),
                "--output", str(tmp_path / "out"), "--audit-schema"])
    rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0 and rep2["schema_ok"] is True
