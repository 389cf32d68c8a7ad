"""Write-audit-publish (checkpoint.py audit_publish): the suite as a
PUBLISH GATE over the snapshot-manifest seam — failing data never
becomes visible; the previous snapshot keeps serving reads."""

import os

import pytest
from pyspark.errors import AnalysisException

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.checkpoint import (
    SnapshotManifestCommit,
    audit_publish,
)

SUITE = CheckSuite({"properties": {"n_tok": {"minimum": 1}}})


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, n_tok: long")


def test_publish_on_pass(spark, tmp_path):
    proto = SnapshotManifestCommit(str(tmp_path))
    good = _df(spark, [(1, 10), (2, 20), (3, 30)])
    wap = audit_publish(good, SUITE, proto, partition="p1")
    assert wap.published and wap.ok()
    assert wap.result.ok() is True
    visible = proto.read_partition(spark, "table", "p1")
    assert visible.count() == 3
    # the manifest references exactly the staged dir
    assert proto._read_manifest("table")["p1"] == wap.data_dir


def test_failing_audit_publishes_nothing(spark, tmp_path):
    proto = SnapshotManifestCommit(str(tmp_path))
    bad = _df(spark, [(1, 10), (2, 0), (3, 30)])
    wap = audit_publish(bad, SUITE, proto, partition="p1")
    assert not wap.published
    # nothing visible: no snapshot was ever published
    with pytest.raises(AnalysisException):
        proto.read_partition(spark, "table", "p1")
    # the staged dir stays on disk, unreferenced, for drill-down
    assert os.path.isdir(wap.data_dir)
    staged = spark.read.parquet(wap.data_dir)
    assert staged.count() == 3
    viol = wap.result.violations.collect()
    assert len(viol) == 1 and viol[0]["doc_id"] == "2"


def test_previous_snapshot_survives_failed_audit(spark, tmp_path):
    proto = SnapshotManifestCommit(str(tmp_path))
    v1 = audit_publish(_df(spark, [(1, 10), (2, 20)]), SUITE, proto,
                       partition="p1")
    assert v1.published
    v2 = audit_publish(_df(spark, [(1, 10), (2, 0)]), SUITE, proto,
                       partition="p1")
    assert not v2.published
    # readers still see v1 — the gate held
    visible = proto.read_partition(spark, "table", "p1")
    assert {r["n_tok"] for r in visible.collect()} == {10, 20}
    # a fixed rewrite replaces v1 atomically and expires its files
    v1_dir = v1.data_dir
    v3 = audit_publish(_df(spark, [(1, 11), (2, 22), (3, 33)]), SUITE,
                       proto, partition="p1")
    assert v3.published
    assert {r["n_tok"] for r in
            proto.read_partition(spark, "table", "p1").collect()} \
        == {11, 22, 33}
    assert not os.path.isdir(v1_dir)  # superseded snapshot expired


def test_audit_runs_on_written_bytes(spark, tmp_path):
    # the audited DataFrame is a fresh parquet scan of the staged dir,
    # not the incoming logical plan — assert by checking the staged
    # files already exist when violations are computed
    proto = SnapshotManifestCommit(str(tmp_path))
    wap = audit_publish(_df(spark, [(1, 5)]), SUITE, proto, partition="px")
    scan = wap.result.violations.sparkSession.read.parquet(wap.data_dir)
    assert scan.schema == _df(spark, [(1, 5)]).schema
    assert wap.published
