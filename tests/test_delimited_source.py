"""Delimited (CSV) source with corrupt-record quarantine
(sources/delimited.py): the parse gate before the suite."""

import pytest

from jsonschema_valid_spark import CheckSuite

SPEC = {"properties": {
    "doc_id": {"type": "string"},
    "n_tok": {"type": "integer", "minimum": 1},
    "score": {"type": "number"},
}}


def _write(tmp_path, lines, name="in.csv"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_gate_splits_clean_and_quarantine(spark, tmp_path):
    from jsonschema_valid_spark.sources.delimited import read_delimited

    path = _write(tmp_path, [
        "doc_id,n_tok,score",
        "a,10,0.5",
        "b,not_a_number,0.7",   # n_tok fails the integer parse
        "c,30,1.25",
        "d,5,bad_float",        # score fails the double parse
    ])
    clean, quar = read_delimited(spark, path, SPEC)
    assert {r["doc_id"] for r in clean.collect()} == {"a", "c"}
    got = {r["doc_id"]: r for r in quar.collect()}
    assert set(got) == {"b", "d"}
    # the ORIGINAL line rides along for drill-down/replay
    assert got["b"]["_corrupt_record"] == "b,not_a_number,0.7"
    assert got["b"]["n_tok"] is None       # the failed field
    assert got["b"]["score"] == 0.7        # fields that parsed survive
    assert got["d"]["_corrupt_record"] == "d,5,bad_float"


def test_validate_delimited_composes_parse_gate_and_suite(spark, tmp_path):
    from jsonschema_valid_spark.sources.delimited import validate_delimited

    path = _write(tmp_path, [
        "doc_id,n_tok,score",
        "a,10,0.5",
        "b,0,0.7",        # parses fine but violates minimum 1
        "c,oops,0.9",     # does not parse: quarantine, NOT a violation
    ])
    res, quar = validate_delimited(spark, path, CheckSuite(SPEC),
                                   key="doc_id")
    viol = res.violations.collect()
    assert [r["doc_id"] for r in viol] == ["b"]
    assert [r["doc_id"] for r in quar.collect()] == ["c"]
    assert res.ok() is False


def test_tsv_and_all_clean(spark, tmp_path):
    from jsonschema_valid_spark.sources.delimited import validate_delimited

    path = _write(tmp_path, [
        "doc_id\tn_tok\tscore",
        "a\t10\t0.5",
        "b\t20\t0.7",
    ], name="in.tsv")
    res, quar = validate_delimited(spark, path, CheckSuite(SPEC),
                                   key="doc_id", sep="\t")
    assert res.ok() is True
    assert quar.isEmpty()


def test_nested_suite_refused(spark, tmp_path):
    from jsonschema_valid_spark.sources.delimited import read_delimited

    nested = {"properties": {
        "doc_id": {"type": "string"},
        "tokens": {"type": "array", "items": {"type": "integer"}},
    }}
    with pytest.raises(ValueError, match="delimited text cannot carry"):
        read_delimited(spark, _write(tmp_path, ["doc_id,tokens", "a,1"]),
                       nested)
