"""The curation-pipeline example must run end-to-end at sf0.001 and obey the
monotone-shrinkage + clean-gate invariants."""

import os
import sys

import pytest

from tests.conftest import SF_DIR

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_curation_pipeline_end_to_end(spark, tmp_path):
    from curation_pipeline import curate, validate_and_write

    stages = curate(spark, SF_DIR)
    n = {name: df.count() for name, df in stages.items()}
    assert n["profiled"] > 0
    # each stage only removes rows
    assert n["profiled"] >= n["kept"] >= n["exact"] >= n["curated"] > 0
    # the validated clean set has zero violations by construction
    assert validate_and_write(spark, stages["curated"], str(tmp_path)) is True
    clean = spark.read.parquet(f"{tmp_path}/clean")
    assert clean.count() > 0
    assert "quality" in clean.columns and "fp" in clean.columns


def test_training_prep_pipeline(spark, tmp_path):
    """End-to-end training-prep composition: gate → dedup → mix → split →
    pack → validate → write; the final engine gate over the pipeline's own
    output must PASS."""
    from pyspark.sql import functions as F

    from training_prep_pipeline import prepare, validate_and_write

    stages = prepare(spark, SF_DIR, budget_tokens_per_source=20_000.0,
                     holdout_rate=0.1, capacity=2048)
    train = {r["doc_id"] for r in stages["train"].select("doc_id").collect()}
    hold = {r["doc_id"] for r in stages["holdout"].select("doc_id").collect()}
    mixed = {r["doc_id"] for r in stages["mixed"].select("doc_id").collect()}
    assert train and hold and (train | hold) == mixed and not (train & hold)

    out = str(tmp_path / "prep_out")
    assert validate_and_write(spark, stages["packed"], out, capacity=2048)
    written = spark.read.parquet(out)
    assert written.count() == len(train)
    assert {r["doc_id"] for r in written.select("doc_id").collect()} == train
    # block addresses well-formed
    bad = written.where((F.col("bin_offset") < 0)
                        | (F.col("bin_offset") >= 2048)).count()
    assert bad == 0


def test_ops_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    from ops_pipeline import nightly, prove_rewrite

    work = str(tmp_path / "ops")
    out = nightly(spark, SF_DIR, work, run_seq=1)
    assert out["summary"].processed            # every source partition ran
    assert out["violations"].isEmpty()         # suggested suite fits the data
    assert out["summary"].anomalies == []      # no history yet

    # a second healthy run only skips (checkpoint) but still records metrics
    out2 = nightly(spark, SF_DIR, work, run_seq=2)
    assert out2["summary"].processed           # fresh run dir → re-validated

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    faithful = prove_rewrite(spark, docs, docs.repartition(3), "source",
                             ["doc_id", "text", "lang", "source", "n_chars"])
    assert faithful["flagged"] == [] and faithful["diff"] is None

    broken = docs.withColumn(
        "n_chars", F.when((F.col("source") == "src4") & (F.col("doc_id") % 13 == 0),
                          F.lit(-1)).otherwise(F.col("n_chars")))
    rec = prove_rewrite(spark, docs, broken, "source",
                        ["doc_id", "text", "lang", "source", "n_chars"])
    assert rec["flagged"] == ["src4"]
    kinds = {r["diff_kind"] for r in rec["diff"].collect()}
    assert kinds == {"value_mismatch"}


def test_ingest_hygiene_pipeline(spark, tmp_path):
    from examples.ingest_hygiene_pipeline import run
    from tests.conftest import SF_DIR

    out = run(spark, SF_DIR, str(tmp_path))
    # pre-flight: contract matches the footer schema (5 'ok' rows), and
    # 5 of the 6 declared language slices report (ja licensed, not live)
    assert out["schema_ok"] is True and out["schema_findings"] == 5
    assert out["coverage_ok"] is True
    assert out["coverage"] == pytest.approx(5 / 6, abs=1e-3)
    # every mod-11 twin folds back into its source entity
    assert out["records_in"] - out["entities"] == \
        len([k for k in range(0, 150, 11)])
    assert out["gates_ok"] is True
    # every mod-41 leak source dropped from the clean vector set
    assert out["vectors_in"] - out["vectors_clean"] == \
        len([k for k in range(0, 500, 41)])
    assert out["layout_files"] == 8
    assert out["padding_efficiency"] > 0.75


def test_star_schema_pipeline(spark):
    from examples.star_schema_pipeline import run
    from tests.conftest import SF_DIR

    out = run(spark, SF_DIR)
    # foreign keys are clean at every SF (bloom mode included: violations
    # are Bloom-certain, so 0 here proves no false alarms either)
    assert out["orders_fk_violations"] == 0
    # the synthetic o_totalprice is NOT derived from lineitem: every
    # order is a rollup mismatch (the check working, not the data lying)
    assert out["orders_rollup_mismatches"] == 1500
    # the generator really does emit duplicate (l_orderkey, l_linenumber)
    # pairs -- composite x-unique catches them; everything else passes
    assert out["lineitem_failed_checks"] == ["properties/line_id/x-unique"]
    assert not out["lineitem_ok"] and out["lineitem_violations"] > 1000
