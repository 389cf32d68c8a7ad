"""Profiling + constraint suggestion (operators/profile.py)."""

import pytest
from pyspark.sql import Row, functions as F

from jsonschema_valid_spark.operators.profile import (
    profile_columns,
    suggest_constraints,
    suite_from_profile,
)
from jsonschema_valid_spark.suite.spec import CheckSuite
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_profile_shape_and_basics(spark, docs):
    prof = profile_columns(docs, distinct="exact")
    rows = {r["col_name"]: r for r in prof.collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
    n = docs.count()
    did = rows["doc_id"]
    assert did["n_rows"] == n
    assert did["n_null"] == 0 and did["null_rate"] == 0.0
    assert did["n_distinct"] == n          # doc_id unique in documents
    assert did["dtype"] == "bigint"
    assert did["mean"] is not None and did["stddev"] is not None
    assert did["avg_len"] is None and did["max_len"] is None
    txt = rows["text"]
    assert txt["mean"] is None and txt["avg_len"] is not None
    assert txt["max_len"] >= 1
    assert txt["min_str"] is not None      # lexicographic min of the text


def test_profile_nulls_and_arrays(spark):
    df = spark.createDataFrame(
        [Row(a=1, s="x", arr=[1, 2]),
         Row(a=None, s="yy", arr=[3]),
         Row(a=3, s=None, arr=None),
         Row(a=3, s="x", arr=[])],
        "a int, s string, arr array<int>")
    rows = {r["col_name"]: r
            for r in profile_columns(df, distinct="exact").collect()}
    assert rows["a"]["n_null"] == 1 and rows["a"]["null_rate"] == 0.25
    assert rows["a"]["n_distinct"] == 2    # 1, 3 (nulls excluded)
    assert rows["arr"]["min_str"] is None  # arrays: no portable min/max
    assert rows["arr"]["avg_len"] == round((2 + 1 + 0) / 3, 6)
    assert rows["arr"]["max_len"] == 2
    assert rows["s"]["max_len"] == 2


def test_profile_approx_mode_close(spark, docs):
    exact = {r["col_name"]: r["n_distinct"]
             for r in profile_columns(docs, distinct="exact").collect()}
    approx = {r["col_name"]: r["n_distinct"]
              for r in profile_columns(docs, distinct="approx").collect()}
    for c, e in exact.items():
        assert approx[c] == pytest.approx(e, rel=0.1)


def test_profile_cols_subset_and_errors(spark, docs):
    prof = profile_columns(docs, cols=["doc_id"]).collect()
    assert len(prof) == 1 and prof[0]["col_name"] == "doc_id"
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_columns(docs, cols=["nope"])
    with pytest.raises(ValueError, match="distinct"):
        profile_columns(docs, distinct="maybe")


def test_profile_single_scan_plan(spark, docs):
    """The whole profile is ONE aggregation job over ONE scan — the
    physical plan reads the parquet relation exactly once (exact mode
    pays an Expand for the multi-distinct, but never a second scan)."""
    plan = (profile_columns(spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                            distinct="exact")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1
    approx_plan = (profile_columns(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        distinct="approx")._jdf.queryExecution().executedPlan().toString())
    assert approx_plan.count("Scan parquet") == 1
    assert "Expand" not in approx_plan   # HLL mode: no row multiplication


def test_suggestions_ladder(spark):
    df = spark.createDataFrame(
        [Row(id=i, cat="c%d" % (i % 3), score=float(i),
             free="t" * (i % 7 + 1)) for i in range(100)]
        + [Row(id=100, cat=None, score=None, free="x")],
        "id bigint, cat string, score double, free string")
    sugg = suggest_constraints(profile_columns(df, distinct="exact"))
    got = {(r["col_name"], r["keyword"]): r for r in sugg.collect()}

    assert got[("id", "type")]["param_txt"] == "integer"
    assert ("id", "x-unique") in got
    assert got[("id", "minimum")]["param_num"] == 0.0
    assert got[("id", "maximum")]["param_num"] == 100.0
    assert ("id", "required") in got

    # cat: 3 distinct + a null -> enum + x-nullRate (ceil to 1/101 -> 0.01)
    assert got[("cat", "enum")]["param_num"] == 3.0
    assert got[("cat", "x-nullRate")]["param_num"] == 0.01
    assert ("cat", "required") not in got
    assert ("cat", "x-unique") not in got

    assert got[("score", "type")]["param_txt"] == "number"
    assert ("score", "x-nullRate") in got

    # free: 7 distinct lengths -> maxLength 7; enum (7 <= 20)
    assert got[("free", "maxLength")]["param_num"] == 7.0
    assert ("free", "enum") in got


def test_suggested_suite_self_consistent(spark, docs):
    spec = suite_from_profile(docs, key="doc_id")
    assert spec["properties"]["doc_id"].get("x-unique") is True
    assert "enum" in spec["properties"]["source"]
    res = CheckSuite(spec).run(docs, key="doc_id")
    assert res.violations.isEmpty()
    assert res.verdicts.where("passed = false").isEmpty()


def test_suggested_suite_catches_corruption(spark, docs):
    spec = suite_from_profile(docs, key="doc_id")
    bad = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 50 == 0, F.lit(10 ** 9)).otherwise(F.col("n_chars")),
    ).withColumn(
        "source",
        F.when(F.col("doc_id") % 70 == 0, F.lit("NOT_A_SOURCE"))
         .otherwise(F.col("source")),
    )
    res = CheckSuite(spec).run(bad, key="doc_id")
    kinds = {r["check_id"].rsplit("/", 1)[-1]
             for r in res.violations.select("check_id").distinct().collect()}
    assert "maximum" in kinds and "enum" in kinds


def test_enum_bound_respected(spark):
    df = spark.createDataFrame(
        [Row(k=i, v="v%03d" % (i % 30)) for i in range(300)],
        "k bigint, v string")
    spec = suite_from_profile(df, key="k", enum_max=20)
    assert "enum" not in spec["properties"]["v"]          # 30 > enum_max
    spec2 = suite_from_profile(df, key="k", enum_max=40)
    assert len(spec2["properties"]["v"]["enum"]) == 30


def test_profile_by_group(spark, docs):
    prof = profile_columns(docs, distinct="exact", by="source")
    assert prof.columns[0] == "grp"
    n_groups = docs.select("source").distinct().count()
    # 4 profiled columns (source excluded) × groups
    assert prof.count() == 4 * n_groups
    one = {r["col_name"]: r for r in prof.where("grp = 'src1'").collect()}
    grp_n = docs.where("source = 'src1'").count()
    assert one["doc_id"]["n_rows"] == grp_n
    assert one["doc_id"]["n_distinct"] == grp_n
    # single scan even in grouped exact mode
    plan = (profile_columns(spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                            distinct="exact", by="source")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1


def test_suggest_row_count_bounds(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_row_count_bounds,
    )

    rows = [(i, "a" if i < 10 else "b") for i in range(16)]  # a:10, b:6
    df = spark.createDataFrame(rows, "doc_id: long, src: string")
    node = suggest_row_count_bounds(df, "src")
    assert node == {"min": 3, "max": 20}
    # self-consistent: the suggested node passes on the profiled table
    spec = {"properties": {"src": {"x-rowCount": node}}}
    assert CheckSuite(spec).run(df, key="doc_id").ok()
    # and catches a group collapsing beyond the headroom
    shrunk = df.where("src != 'b' or doc_id < 12")  # b: 6 -> 2 rows
    res = CheckSuite(spec).run(shrunk, key="doc_id")
    assert [r["doc_id"] for r in res.violations.collect()] == ["b"]
    # empty table -> None; bad headroom refused
    assert suggest_row_count_bounds(df.where("1=0"), "src") is None
    import pytest as _pt
    with _pt.raises(ValueError):
        suggest_row_count_bounds(df, "src", headroom=0.5)


# ---------------------------------------------------------------- profile_diff

def test_profile_diff_aspects(spark, docs):
    from jsonschema_valid_spark.operators.profile import profile_diff

    cur_tbl = (docs
               .withColumn("text", F.when(F.col("doc_id") % 5 == 0,
                                          F.lit(None)).otherwise(F.col("text")))
               .withColumn("n_chars", F.col("n_chars") * 10)
               .drop("lang")
               .withColumn("v2_flag", F.lit(1)))
    cur = profile_columns(cur_tbl, distinct="exact")
    ref = profile_columns(docs, distinct="exact")
    got = {(r["col_name"], r["aspect"]): (r["cur_v"], r["ref_v"])
           for r in profile_diff(cur, ref).collect()}
    assert set(got) == {("lang", "removed"), ("v2_flag", "added"),
                        ("text", "null_rate"), ("n_chars", "mean")}
    assert got[("lang", "removed")] == ("<absent>", "string")
    assert got[("v2_flag", "added")] == ("int", "<absent>")
    assert got[("text", "null_rate")][0] == "0.2000"
    assert got[("text", "null_rate")][1] == "0.0000"


def test_profile_diff_no_drift_is_empty(spark, docs):
    from jsonschema_valid_spark.operators.profile import profile_diff

    prof = profile_columns(docs, distinct="exact")
    assert profile_diff(prof, prof).count() == 0


def test_profile_diff_dtype_and_distinct(spark):
    from jsonschema_valid_spark.operators.profile import profile_diff

    a = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(100)], "k: long, v: double")
    b = spark.createDataFrame(
        [(i, i % 50) for i in range(100)], "k: long, v: int")
    pa, pb = profile_columns(a, distinct="exact"), \
        profile_columns(b, distinct="exact")
    got = {(r["col_name"], r["aspect"]): (r["cur_v"], r["ref_v"])
           for r in profile_diff(pa, pb).collect()}
    assert got[("v", "dtype")] == ("double", "int")
    # 3 distinct vs 50 distinct: ratio 0.06 < 1/2
    assert got[("v", "distinct")] == ("3", "50")


def test_suggest_drift_baseline_closes_loop(spark):
    """The suggested x-drift node passes on the profiled snapshot by
    construction and flags a genuinely shifted regeneration."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_drift_baseline,
    )

    def gen(n, shift=0):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 37) % 120 + 8 + shift).cast("int").alias("n_tok"))

    node = suggest_drift_baseline(gen(20000), "n_tok")
    assert node is not None and node["psiMax"] == 0.25
    assert sum(node["baseline"].values()) == 20000
    # derived width: range 119 / 32 buckets -> snapped to 4.0
    assert node["bucketWidth"] == 4.0

    spec = {"properties": {"n_tok": {"x-drift": node}}}
    assert CheckSuite(spec).run(gen(20000), key="doc_id").ok() is True
    # same shape at half the volume still passes (normalized histograms)
    assert CheckSuite(spec).run(gen(10000), key="doc_id").ok() is True
    assert CheckSuite(spec).run(gen(20000, shift=40),
                                key="doc_id").ok() is False

    # explicit width is honored; empty column -> None
    node2 = suggest_drift_baseline(gen(1000), "n_tok", bucket_width=16.0)
    assert node2["bucketWidth"] == 16.0
    empty = spark.createDataFrame([], "doc_id long, n_tok int")
    assert suggest_drift_baseline(empty, "n_tok") is None


def test_suggest_drift_baseline_quantile_mode(spark):
    """Equi-depth bootstrap: edges at the snapshot's own percentiles,
    every bucket ~equal mass; passes on itself, flags a tail explosion
    that fixed-width bucketing at the same budget dilutes."""
    import pytest as _pt

    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_drift_baseline,
    )

    # heavy-tailed: 95% small values, 5% spread over a huge range
    def gen(n, body_shift=0):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 < 19,
                   (F.col("id") % 50 + body_shift).cast("double"))
             .otherwise((F.col("id") % 1000).cast("double") * 100)
            .alias("v"))

    node = suggest_drift_baseline(gen(20000), "v", n_buckets=16,
                                  mode="quantile")
    assert node is not None and "edges" in node and "bucketWidth" not in node
    assert node["edges"] == sorted(node["edges"])
    assert sum(node["baseline"].values()) == 20000
    # equal-depth within rounding: no bucket owns more than ~2x its share
    assert max(node["baseline"].values()) <= 2 * (20000 // 16) + 1500

    spec = {"properties": {"v": {"x-drift": node}}}
    assert CheckSuite(spec).run(gen(20000), key="doc_id").ok() is True
    # same shape at half the volume passes (normalized)
    assert CheckSuite(spec).run(gen(10000), key="doc_id").ok() is True
    # body mass shifted across the quantile edges: PSI trips
    assert CheckSuite(spec).run(gen(20000, body_shift=30),
                                key="doc_id").ok() is False

    # constant column degenerates to a single edge, still valid
    const = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(7.0).alias("v"))
    cn = suggest_drift_baseline(const, "v", n_buckets=8, mode="quantile")
    assert cn["edges"] == [7.0] and cn["baseline"] == {1: 100}

    empty = spark.createDataFrame([], "doc_id long, v double")
    assert suggest_drift_baseline(empty, "v", mode="quantile") is None
    with _pt.raises(ValueError):
        suggest_drift_baseline(const, "v", mode="depth")


def test_suggest_frequency_cap_closes_loop(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_frequency_cap,
    )

    def gen(n, hot_every=5):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % hot_every == 0, F.lit("hot"))
             .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("v"))

    node = suggest_frequency_cap(gen(10000), "v")  # top share 0.2
    assert node == {"maxFraction": 0.3}  # 0.2 * 1.5
    spec = {"properties": {"v": {"x-maxFrequency": node}}}
    assert CheckSuite(spec).run(gen(10000), key="doc_id").ok() is True
    # the hot value floods to 50%: cap trips
    assert CheckSuite(spec).run(gen(10000, hot_every=2),
                                key="doc_id").ok() is False

    # floor stops hair-trigger caps on near-unique columns
    uniq = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    assert suggest_frequency_cap(uniq, "v")["maxFraction"] == 0.01

    empty = spark.createDataFrame([], "doc_id long, v string")
    assert suggest_frequency_cap(empty, "v") is None
    import pytest as _pt
    with _pt.raises(ValueError):
        suggest_frequency_cap(uniq, "v", headroom=1.0)


def test_string_signatures_and_collapse(spark):
    from jsonschema_valid_spark.operators.profile import string_signatures

    df = spark.createDataFrame(
        [(1, "25-989-741-2988"), (2, "1-23-4-5"), (3, "Customer#001"),
         (4, "FURNITURE"), (5, None)], "id: long, v: string")
    got = {r.signature: r.cnt
           for r in string_signatures(df, "v").collect()}
    # collapse: both phone shapes share one template; NULL excluded
    assert got == {"9-9-9-9": 2, "Aa#9": 1, "A": 1}
    raw = {r.signature: r.cnt
           for r in string_signatures(df, "v", collapse=False).collect()}
    assert raw["99-999-999-9999"] == 1 and raw["9-99-9-9"] == 1


def test_suggest_string_pattern_coverage_and_refusal(spark):
    from jsonschema_valid_spark.operators.profile import (
        suggest_string_pattern,
    )

    rows = [(i, f"{i % 90 + 10}-{i}-{i * 7}") for i in range(95)]
    rows += [(100 + i, f"ID#{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "id: long, v: string")
    # 95% phone-ish: the dominant format alone satisfies the bar
    pat = suggest_string_pattern(df, "v", min_coverage=0.9)
    assert pat == "^(?:[0-9]+-[0-9]+-[0-9]+)$"
    # the pattern actually validates the dominant slice (and the
    # quantifier widening never drops a covered row)
    n = df.where(F.col("v").rlike(pat)).count()
    assert n == 95
    # demanding full coverage pulls in the second format
    pat2 = suggest_string_pattern(df, "v", min_coverage=1.0)
    assert pat2 is not None and "#" in pat2
    assert df.where(F.col("v").rlike(pat2)).count() == 100
    # too many formats within the collection bound: refuse
    wide = spark.createDataFrame(
        [(i, "x" * (i % 7) + "-" * (i % 5) + "#" * (i % 3))
         for i in range(200)], "id: long, v: string")
    assert suggest_string_pattern(wide, "v", min_coverage=0.99,
                                  max_signatures=3) is None
    empty = spark.createDataFrame([(1, None)], "id: long, v: string")
    assert suggest_string_pattern(empty, "v") is None


def test_suggested_pattern_feeds_the_pattern_keyword(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_string_pattern,
    )

    df = spark.createDataFrame(
        [(i, f"{10 + i % 80}-{i}") for i in range(50)],
        "doc_id: long, code: string")
    pat = suggest_string_pattern(df, "code", min_coverage=0.95)
    res = CheckSuite({"properties": {"code": {
        "pattern": pat}}}).run(df, key="doc_id")
    assert res.ok()
    bad = df.union(spark.createDataFrame([(999, "BROKEN FORMAT")],
                                         df.schema))
    assert not CheckSuite({"properties": {"code": {
        "pattern": pat}}}).run(bad, key="doc_id").ok()


def test_suggest_distinct_ratio_bounds(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_distinct_ratio_bounds,
    )

    rows = [(i, "a", i) for i in range(40)]            # ratio 1.0
    rows += [(100 + i, "b", i % 20) for i in range(40)]  # ratio 0.5
    rows += [(200, "thin", 1), (201, "thin", 1)]         # under min_count
    df = spark.createDataFrame(rows, "id: long, grp: string, v: long")
    node = suggest_distinct_ratio_bounds(df, "v", by="grp")
    assert node == {"min": 0.25, "minCount": 5, "by": "grp"}
    # self-consistent: the profiled table passes its own suggestion
    suite = CheckSuite({"properties": {"v": {"x-distinctRatio": node}}})
    assert suite.run(df, key="id").ok()
    # a collapse past the historical floor trips it
    bad = df.union(spark.createDataFrame(
        [(300 + i, "c", 7) for i in range(40)], df.schema))
    assert not suite.run(bad, key="id").ok()

    import pytest as _pt
    with _pt.raises(ValueError):
        suggest_distinct_ratio_bounds(df, "v", headroom=1.0)
    empty = spark.createDataFrame([(1, "a", None)],
                                  "id: long, grp: string, v: long")
    assert suggest_distinct_ratio_bounds(empty, "v", by="grp") is None


def test_suggest_compliance_and_trend_bounds(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_compliance_floor,
        suggest_trend_bounds,
    )

    rows = []
    for i in range(50):
        rows.append((i, "a", float(i), float(i + 1)))          # all pass
        rows.append((100 + i, "b", float(i),
                     float(i + 1) if i % 5 else -1.0))         # 80% pass
    df = spark.createDataFrame(rows, "id: long, grp: string, x: double, "
                                     "v: double")
    node = suggest_compliance_floor(df, "v", "v > 0", by="grp")
    assert node["min"] == 0.533333 and node["by"] == "grp"
    suite = CheckSuite({"properties": {"v": {"x-compliance": node}}})
    assert suite.run(df, key="id").ok()
    # a collapse past the floor trips
    bad = df.union(spark.createDataFrame(
        [(200 + i, "c", float(i), -1.0) for i in range(50)], df.schema))
    assert not suite.run(bad, key="id").ok()

    tnode = suggest_trend_bounds(df, "v", "x", by="grp")
    assert tnode["max"] >= 1.0 and tnode["min"] == -tnode["max"]
    tsuite = CheckSuite({"properties": {"v": {"x-trend": tnode}}})
    assert tsuite.run(df, key="id").ok()
    runaway = df.union(spark.createDataFrame(
        [(300 + i, "r", float(i), 50.0 * i) for i in range(50)],
        df.schema))
    assert not tsuite.run(runaway, key="id").ok()

    import pytest as _pt
    with _pt.raises(ValueError):
        suggest_compliance_floor(df, "v", "v > 0", headroom=1.0)
    flat = spark.createDataFrame([(1, "a", 1.0, 1.0)], df.schema)
    assert suggest_trend_bounds(flat, "v", "x", by="grp") is None


# ---- wave 28: inclusion-dependency discovery ----------------------------

def test_suggest_referential_contained_and_roundtrip(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import suggest_referential

    fact = spark.createDataFrame(
        [(i, i % 5) for i in range(100)] + [(100, None)],
        "id: long, fk: int")
    dim = spark.createDataFrame([(k,) for k in range(5)], "pk: int")
    s = suggest_referential(fact, "fk", dim, "pk", "dim")
    assert s["contained"] is True and s["missing"] == 0
    assert s["distinct"] == 5  # NULL fk excluded
    assert s["node"] == {"domain": "@dim", "domainColumn": "pk"}

    # round-trip: the suggested node validates the snapshot cleanly...
    suite = CheckSuite({"properties": {"fk": {"x-referential": s["node"]}}})
    res = suite.run(fact, key="id", context={"dim": dim})
    assert res.violations.count() == 0
    # ...and catches a value outside the discovered domain
    bad = fact.union(spark.createDataFrame([(101, 99)], fact.schema))
    assert suite.run(bad, key="id",
                     context={"dim": dim}).violations.count() == 1


def test_suggest_referential_rejects_and_tolerance(spark):
    from jsonschema_valid_spark.operators.profile import suggest_referential

    fact = spark.createDataFrame(
        [(i, i % 10) for i in range(100)], "id: long, fk: int")
    dim = spark.createDataFrame([(k,) for k in range(9)], "pk: int")

    s = suggest_referential(fact, "fk", dim, "pk", "dim")
    assert s["contained"] is False and s["node"] is None
    assert s["missing"] == 1 and s["distinct"] == 10

    # 1 of 10 distinct values missing = ratio 0.1 -> tolerated at 0.15
    s2 = suggest_referential(fact, "fk", dim, "pk", "dim", tolerance=0.15)
    assert s2["contained"] is True and s2["node"] is not None

    import pytest as _pytest
    with _pytest.raises(ValueError):
        suggest_referential(fact, "fk", dim, "pk", "dim", tolerance=1.0)


# ---- wave 29: entropy bounds bootstrap -----------------------------------

def test_suggest_entropy_bounds_roundtrip(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_entropy_bounds,
    )

    rows = []
    i = 0
    for grp, mix in (("a", "uvwx" * 10), ("b", "uuvw" * 10)):
        for v in mix:
            rows.append((i, grp, v)); i += 1
    # a tiny group must not pin the floor
    rows.append((i, "tiny", "u")); i += 1
    df = spark.createDataFrame(rows, "id: long, grp: string, v: string")

    node = suggest_entropy_bounds(df, "v", by="grp", pad=0.15)
    assert node["by"] == "grp" and node["minCount"] == 10
    assert 0.0 <= node["min"] < node["max"]
    suite = CheckSuite({"properties": {"v": {"x-entropy": node}}})
    assert suite.run(df, key="id").ok()

    # a collapsed group trips the learned floor
    bad = df.union(spark.createDataFrame(
        [(1000 + j, "c", "u") for j in range(40)], df.schema))
    assert not suite.run(bad, key="id").ok()

    # nothing trustworthy to learn from -> None
    flat = spark.createDataFrame([(1, "a", "u")], df.schema)
    assert suggest_entropy_bounds(flat, "v", by="grp") is None

    import pytest as _pt
    with _pt.raises(ValueError):
        suggest_entropy_bounds(df, "v", pad=0.0)


# ---- wave 34: seasonality floor bootstrap --------------------------------

def test_suggest_seasonality_floor_roundtrip(spark):
    import pytest as _pt

    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_seasonality_floor,
    )

    rows = []
    for i in range(60):
        rows.append((i, "a", i, float((i % 4) * 10)))       # period 4
        rows.append((100 + i, "b", i,
                     float((i % 4) * 10 + (i % 3))))        # noisy period 4
    df = spark.createDataFrame(rows, "id: long, grp: string, o: int, "
                                     "v: double")
    node = suggest_seasonality_floor(df, "v", key="id", order_by="o",
                                     lag=4, by="grp")
    assert node["lag"] == 4 and node["by"] == "grp"
    assert 0.5 < node["min"] < 1.0
    suite = CheckSuite({"properties": {"v": {"x-seasonality": node}}})
    assert suite.run(df, key="id").ok()   # passes its own snapshot
    # a group on the WRONG period (3, not 4) trips the floor: a period-3
    # sawtooth at lag 4 has acf exactly -0.5
    bad = df.union(spark.createDataFrame(
        [(300 + i, "c", i, float((i % 3) * 10)) for i in range(60)],
        df.schema))
    assert not suite.run(bad, key="id").ok()

    with _pt.raises(ValueError):
        suggest_seasonality_floor(df, "v", key="id", order_by="o",
                                  lag=4, by="grp", pad=0.0)
    # constant series: undefined acf everywhere -> nothing to learn
    flat = spark.createDataFrame([(i, "a", i, 5.0) for i in range(20)],
                                 df.schema)
    assert suggest_seasonality_floor(flat, "v", key="id", order_by="o",
                                     lag=4, by="grp") is None
    # anti-correlated snapshot: padded floor <= -1 is unfailable -> None
    anti = spark.createDataFrame(
        [(i, "a", i, float((i % 2) * 8)) for i in range(60)],
        df.schema)
    assert suggest_seasonality_floor(anti, "v", key="id", order_by="o",
                                     lag=1, by="grp", pad=0.5) is None
