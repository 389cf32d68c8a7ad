"""x-contiguous: integer sequence completeness (wave 28) — 'number 7
is missing' detection that rowCount/monotonic/unique cannot express."""

import pytest

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.contiguity import (
    contiguity_group_verdicts,
    contiguity_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    i = 0
    for v in range(1, 11):                       # full: 1..10, no holes
        rows.append((i, "full", v)); i += 1
    for v in (1, 2, 3, 6, 7, 10):                # holey: missing 4,5,8,9
        rows.append((i, "holey", v)); i += 1
    for v in (1, 1, 2, 3, 3):                    # dups: contiguous
        rows.append((i, "dups", v)); i += 1
    for v in (1, 3):                             # lenient: one hole
        rows.append((i, "lenient", v)); i += 1
    rows.append((i, "full", None)); i += 1       # NULL excluded
    return spark.createDataFrame(rows, "id: long, grp: string, seq: int")


def test_summary_violations_and_max_missing(spark):
    df = _df(spark)
    v = contiguity_violations(df, "seq", "c", by="grp")
    got = {r.doc_id: r.observed for r in v.collect()}
    assert got == {
        "holey": "present=6,span=[1,10],missing=4",
        "lenient": "present=2,span=[1,3],missing=1",
    }
    v1 = contiguity_violations(df, "seq", "c", by="grp", max_missing=1)
    assert {r.doc_id for r in v1.collect()} == {"holey"}


def test_gaps_mode_locates_runs(spark):
    df = _df(spark)
    g = contiguity_violations(df, "seq", "c", by="grp", report="gaps")
    got = sorted((r.doc_id, r.observed) for r in g.collect())
    assert got == [
        ("holey", "gap=[4,5],len=2"),
        ("holey", "gap=[8,9],len=2"),
        ("lenient", "gap=[2,2],len=1"),
    ]
    with pytest.raises(ValueError):
        contiguity_violations(df, "seq", "c", report="gaps")  # no by


def test_global_summary(spark):
    df = _df(spark).where("grp = 'holey'")
    v = contiguity_violations(df, "seq", "c")
    rows = v.collect()
    assert len(rows) == 1 and rows[0].doc_id == "<global>"
    assert rows[0].observed == "present=6,span=[1,10],missing=4"


def test_keyword_both_paths_where_and_verdicts(spark):
    df = _df(spark)
    spec = {"properties": {"seq": {"x-contiguous": {"by": "grp"}}}}
    res = CheckSuite(spec).run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == \
        {"holey", "lenient"}
    verd = {r.check_id: r.passed for r in res.verdicts.collect()}
    assert verd["properties/seq/x-contiguous"] is False
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    assert {r.doc_id for r in summ.violations.collect()} == \
        {"holey", "lenient"}

    scoped = {"properties": {"seq": {"x-contiguous": {
        "by": "grp", "where": "grp <> 'holey'", "maxMissing": 1}}}}
    assert CheckSuite(scoped).run(df, key="id").violations.count() == 0

    per = {"properties": {"seq": {"x-contiguous": {
        "by": "grp", "verdicts": "perGroup"}}}}
    res2 = CheckSuite(per).run(df, key="id")
    got = {r.partition_id: (r.passed, r.metric_value)
           for r in res2.verdicts.collect()
           if r.check_id == "properties/seq/x-contiguous"}
    assert got == {"full": (True, 0.0), "holey": (False, 4.0),
                   "dups": (True, 0.0), "lenient": (False, 1.0)}

    # gaps mode through the keyword
    gaps = {"properties": {"seq": {"x-contiguous": {
        "by": "grp", "report": "gaps"}}}}
    res3 = CheckSuite(gaps).run(df, key="id")
    assert res3.violations.count() == 3


def test_per_group_verdicts_direct(spark):
    df = _df(spark)
    g = contiguity_group_verdicts(df, "seq", "c", by="grp", max_missing=1)
    got = {r.partition_id: r.passed for r in g.collect()}
    assert got == {"full": True, "holey": False, "dups": True,
                   "lenient": True}


def test_spec_validation(spark):
    for bad in (
        {"maxMissing": -1},
        {"maxMissing": True},
        {"report": "gaps"},                       # gaps without by
        {"report": "gaps", "by": "g", "maxMissing": 2},  # gaps+maxMissing
        {"report": "nope", "by": "g"},
        {"verdicts": "perGroup"},                 # no by
        {"verdicts": "perGroup", "by": "g", "report": "gaps"},
        {"where": ""},
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec(
                {"properties": {"x": {"x-contiguous": bad}}})
    validate_suite_spec({"properties": {"x": {"x-contiguous": {}}}})
    validate_suite_spec({"properties": {"x": {"x-contiguous": {
        "by": "g", "report": "gaps", "where": "g <> 'z'"}}}})
    validate_suite_spec({"properties": {"x": {"x-contiguous": {
        "by": "g", "maxMissing": 3, "verdicts": "perGroup"}}}})
