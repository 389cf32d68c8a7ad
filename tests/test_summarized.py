"""run_suite_summarized must be observationally identical to the lazy
run_suite (violations set and verdicts set), while scanning the fat columns
once instead of twice."""

from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.sources.sequences import load_sequences, source_domain
from tests.conftest import SF_DIR

SUITE = {
    "version": 7,
    "required": ["doc_id", "tokens", "n_tok"],
    "properties": {
        "doc_id": {"pattern": "^doc-[0-9]{12}$", "x-unique": True},
        "tokens": {"minItems": 1,
                   "items": {"minimum": 0, "exclusiveMaximum": 50257}},
        "n_tok": {"minimum": 1,
                  "x-stats": {"avg": {"min": 8, "max": 256}}},
        "source": {"x-nullRate": {"max": 0.05},
                   "x-referential": {"domain": "@dom"}},
    },
    "x-rowExpr": "n_tok = size(tokens)",
}


def _vset(df):
    return {tuple(r) for r in df.collect()}


def test_summarized_matches_lazy(spark):
    seq = load_sequences(spark, SF_DIR).cache()
    ctx = {"dom": source_domain(spark, SF_DIR)}
    suite = CheckSuite(SUITE)

    lazy = suite.run(seq, key="doc_id", partition_by="source", context=ctx)
    summ = run_suite_summarized(suite, seq, key="doc_id",
                                partition_by="source", context=ctx)

    assert _vset(lazy.violations) == _vset(summ.violations)

    # verdict parity: same (partition, check) → (passed, metric) map, except
    # dataset-check labels which the lazy path also reports as <global>
    def vmap(res):
        return {(r["partition_id"], r["check_id"]):
                (r["passed"], round(r["metric_value"], 9))
                for r in res.verdicts.collect()}

    lm, sm = vmap(lazy), vmap(summ)
    assert set(lm) == set(sm)
    for k in lm:
        assert lm[k] == sm[k], f"verdict mismatch at {k}: {lm[k]} vs {sm[k]}"
    assert summ.ok() == lazy.ok() is False
