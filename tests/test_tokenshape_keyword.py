"""x-tokenShape: declarative token-array structure validation (compiler
row-check branch) — BOS prefix, EOS suffix, forbidden ids, trailing-only
padding. The end-anchored checks `items` tuple form cannot express.

All predicates are native Catalyst array expressions riding the fused row
pass: plan-asserted shuffle-free below.
"""

import pytest

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec

BOS, EOS, PAD = 1, 2, 0

_SPEC = {"properties": {"tokens": {"x-tokenShape": {
    "startsWith": [BOS], "endsWith": [EOS], "forbidden": [-5],
    "pad": PAD}}}}


def _df(spark):
    rows = [
        (1, [BOS, 10, 11, EOS]),          # clean
        (2, [7, 10, 11, EOS]),            # badPrefix
        (3, [BOS, 10, 11, 9]),            # badSuffix
        (4, [BOS, -5, 11, EOS]),          # forbidden
        (5, [BOS, 10, EOS, PAD, PAD]),    # trailing pad run: OK for pad,
                                          # but badSuffix (last != EOS)
        (6, [BOS, PAD, 10, EOS]),         # interiorPad
        (7, [BOS]),                       # shorter than prefix+suffix:
                                          # suffix slice = [BOS] != [EOS]
        (8, None),                        # null array: passes (required/
                                          # type police nulls)
        (9, [7, -5, 9]),                  # every witness at once
    ]
    return spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")


def test_witnesses(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {
        "2": "badPrefix",
        "3": "badSuffix",
        "4": "forbidden=-5",
        "5": "badSuffix",
        "6": "interiorPad",
        "7": "badSuffix",
        "9": "badPrefix,badSuffix,forbidden=-5",
    }
    cid = "properties/tokens/x-tokenShape"
    assert all(r["check_id"] == cid for r in res.violations.collect())


def test_multi_token_prefix_suffix(spark):
    spec = {"properties": {"tokens": {"x-tokenShape": {
        "startsWith": [BOS, 5], "endsWith": [9, EOS]}}}}
    rows = [(1, [BOS, 5, 7, 9, EOS]), (2, [BOS, 6, 7, 9, EOS]),
            (3, [BOS, 5, 7, 8, EOS]), (4, [BOS, 5]), (5, [BOS])]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")
    res = CheckSuite(spec).run(df, key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    # doc 4: prefix [1,5] OK; suffix slice = [1,5] != [9,2]
    # doc 5: prefix slice [1] != [1,5]; suffix slice [1] != [9,2]
    assert got == {"2": "badPrefix", "3": "badSuffix",
                   "4": "badSuffix", "5": "badPrefix,badSuffix"}


def test_pad_only_clean_and_absent(spark):
    spec = {"properties": {"tokens": {"x-tokenShape": {"pad": PAD}}}}
    rows = [(1, [5, 6, PAD, PAD]), (2, [5, 6]), (3, [PAD, 5]),
            (4, [PAD, PAD])]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")
    res = CheckSuite(spec).run(df, key="doc_id")
    assert ({r["doc_id"] for r in res.violations.collect()} == {"3"})


def test_rides_fused_row_pass_no_shuffle(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


@pytest.mark.parametrize("bad", [
    {},                                     # empty
    {"startsWith": []},                     # empty id list
    {"startsWith": [1.5]},                  # non-int id
    {"pad": True},                          # bool is not an id
    {"prefix": [1]},                        # unknown key
    [1, 2],                                 # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"tokens": {"x-tokenShape": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)
    assert validate_suite_with_engine(spark, _SPEC).ok()
