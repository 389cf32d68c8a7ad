

def test_parity_tol_numeric_window(spark):
    """tol: numeric columns within |a-b| <= tol match; beyond it, and
    NULL-vs-value, still mismatch; strings stay exact."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.parity import parity_mismatches

    df = spark.createDataFrame(
        [(1, 10.0001, "a"), (2, 10.5, "b"), (3, None, "c"), (4, 7.0, "d")],
        "doc_id: long, v: double, s: string")
    ref = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 10.0, "b"), (3, 10.0, "c"), (4, 7.0, "D")],
        "doc_id: long, v: double, s: string")

    strict = {(r["doc_id"], r["column"]) for r in parity_mismatches(
        df, ref, "doc_id", ["v", "s"]).collect()}
    assert strict == {("1", "v"), ("2", "v"), ("3", "v"), ("4", "s")}

    loose = {(r["doc_id"], r["column"]) for r in parity_mismatches(
        df, ref, "doc_id", ["v", "s"], tol=0.001).collect()}
    # 1 now within tol; 2 beyond; 3 NULL-vs-value; s stays exact
    assert loose == {("2", "v"), ("3", "v"), ("4", "s")}

    # keyword threading
    spec = {"properties": {"v": {"x-parity": {
        "reference": "@ref", "columns": ["v"], "tol": 0.001}}}}
    res = CheckSuite(spec).run(df, key="doc_id", context={"ref": ref})
    assert {r["doc_id"] for r in res.violations.collect()} == {"2", "3"}
