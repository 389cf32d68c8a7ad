"""Property-based tests (SURVEY.md §5): random tables + random bounds ⇒
engine verdicts equal a trivial pure-Python reimplementation.

Each example launches a small Spark job, so examples are capped and the
deadline disabled (Spark latency ≫ hypothesis defaults)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from jsonschema_valid_spark import CheckSuite

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture,
                                           HealthCheck.too_slow])

values = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
rows_strategy = st.lists(values, min_size=1, max_size=12)
bound = st.integers(min_value=-30, max_value=30)


def _python_oracle_bounds(xs, lo, hi):
    """Reference semantics: null skips; violation when outside [lo, hi]."""
    bad = set()
    for i, x in enumerate(xs):
        if x is None:
            continue
        if not (lo <= x <= hi):
            bad.add(f"r{i}")
    return bad


@SETTINGS
@given(xs=rows_strategy, lo=bound, hi=bound)
def test_bounds_match_python_oracle(spark, xs, lo, hi):
    df = spark.createDataFrame(
        [(f"r{i}", x) for i, x in enumerate(xs)], "id string, x long")
    suite = CheckSuite({"properties": {"x": {"minimum": lo, "maximum": hi}}})
    res = suite.run(df, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == _python_oracle_bounds(xs, lo, hi)
    assert res.ok() == (not got)


arrays = st.lists(
    st.lists(st.integers(min_value=-20, max_value=120), min_size=0, max_size=8),
    min_size=1, max_size=8)


@SETTINGS
@given(arrs=arrays, lo=st.integers(0, 40), hi=st.integers(60, 110))
def test_items_rewrite_matches_forall_semantics(spark, arrs, lo, hi):
    """The array_min/array_max bounds rewrite must be indistinguishable from
    per-element forall semantics (including empty arrays)."""
    df = spark.createDataFrame(
        [(f"r{i}", a) for i, a in enumerate(arrs)], "id string, a array<long>")
    suite = CheckSuite({"properties": {"a": {"items": {"minimum": lo, "maximum": hi}}}})
    res = suite.run(df, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    expect = {f"r{i}" for i, a in enumerate(arrs)
              if any(not (lo <= x <= hi) for x in a)}
    assert got == expect


@SETTINGS
@given(xs=st.lists(st.one_of(st.none(), st.sampled_from(["a", "b", "c", "zz"])),
                   min_size=1, max_size=15),
       tau=st.floats(min_value=0.0, max_value=1.0))
def test_nullrate_and_enum_match_python(spark, xs, tau):
    # single partition so the per-partition null rate IS the global rate
    df = spark.createDataFrame(
        [(f"r{i}", x) for i, x in enumerate(xs)], "id string, s string").coalesce(1)
    suite = CheckSuite({"properties": {"s": {"enum": ["a", "b", "c"],
                                             "x-nullRate": {"max": tau}}}})
    res = suite.run(df, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    expect = {f"r{i}" for i, x in enumerate(xs) if x is not None and x == "zz"}
    assert got == expect
    null_rate = sum(1 for x in xs if x is None) / len(xs)
    verdict = res.verdicts.where("check_id like '%x-nullRate%'").first()
    # exact comparison: the engine's avg(isNull) is the same k/n double
    # division as the Python oracle — an epsilon here would hide real
    # off-by-one-ulp threshold bugs (hypothesis found exactly that: at
    # tau = nextafter(1.0, 0) and null_rate 1.0 the engine correctly
    # FAILS while a 1e-12-slackened oracle wrongly expected a pass)
    assert verdict["passed"] == (null_rate <= tau)
    assert verdict["metric_value"] == pytest.approx(null_rate)


# ---------------------------------------------------------------------------
# random combinator suites vs a pure-Python evaluator (null-collapse
# semantics): the generic compile-correctness property
# ---------------------------------------------------------------------------

_scalar_leaf = st.one_of(
    st.builds(lambda v: {"minimum": v}, st.integers(-50, 50)),
    st.builds(lambda v: {"maximum": v}, st.integers(-50, 50)),
    st.builds(lambda v: {"exclusiveMinimum": v}, st.integers(-50, 50)),
    st.builds(lambda v: {"exclusiveMaximum": v}, st.integers(-50, 50)),
    st.builds(lambda v: {"multipleOf": v}, st.integers(1, 9)),
    st.builds(lambda v: {"enum": v},
              st.lists(st.integers(-5, 5), min_size=1, max_size=4)),
    st.builds(lambda v: {"const": v}, st.integers(-5, 5)),
)

_scalar_suite = st.recursive(
    _scalar_leaf,
    lambda inner: st.one_of(
        st.builds(lambda s: {"not": s}, inner),
        st.builds(lambda a, b: {"anyOf": [a, b]}, inner, inner),
        st.builds(lambda a, b: {"allOf": [a, b]}, inner, inner),
        st.builds(lambda a, b: {"oneOf": [a, b]}, inner, inner),
        # $ref indirection through $defs — exercises the resolver inside
        # arbitrary nesting (value-scope $ref short-circuits siblings)
        st.builds(lambda s: {"$defs": {"d0": s}, "$ref": "#/$defs/d0"}, inner),
    ),
    max_leaves=4,
)


def _py_eval(spec, x) -> bool:
    """Pure-Python mirror of compile_value_pred's null-collapse semantics."""
    if x is None:
        return True
    if "$ref" in spec:
        return _py_eval(spec["$defs"]["d0"], x)
    ok = True
    for kw, v in spec.items():
        if kw == "minimum":
            ok = ok and x >= v
        elif kw == "maximum":
            ok = ok and x <= v
        elif kw == "exclusiveMinimum":
            ok = ok and x > v
        elif kw == "exclusiveMaximum":
            ok = ok and x < v
        elif kw == "multipleOf":
            ok = ok and x % v == 0
        elif kw == "enum":
            ok = ok and x in v
        elif kw == "const":
            ok = ok and x == v
        elif kw == "not":
            ok = ok and not _py_eval(v, x)
        elif kw == "anyOf":
            ok = ok and any(_py_eval(s, x) for s in v)
        elif kw == "allOf":
            ok = ok and all(_py_eval(s, x) for s in v)
        elif kw == "oneOf":
            ok = ok and sum(1 for s in v if _py_eval(s, x)) == 1
    return ok


def _hoist_defs(node, root_defs):
    """JSON pointers are ROOT-relative: move generated nested $defs up to the
    document root with unique names (the engine sees a well-formed document;
    _py_eval evaluates the original nested form)."""
    if isinstance(node, list):
        return [_hoist_defs(v, root_defs) for v in node]
    if not isinstance(node, dict):
        return node
    out = {k: _hoist_defs(v, root_defs) for k, v in node.items()
           if k not in ("$defs", "$ref")}
    if "$ref" in node:
        name = f"d{len(root_defs)}"
        root_defs[name] = None  # reserve before recursing (unique names)
        root_defs[name] = _hoist_defs(node["$defs"]["d0"], root_defs)
        out["$ref"] = f"#/$defs/{name}"
    return out


@settings(max_examples=25, deadline=None)
@given(spec=_scalar_suite,
       xs=st.lists(st.one_of(st.none(), st.integers(-60, 60)),
                   min_size=1, max_size=30))
def test_random_combinator_suite_matches_python(spark, spec, xs):
    from jsonschema_valid_spark import CheckSuite

    df = spark.createDataFrame(list(enumerate(xs)), "id long, x long")
    root_defs = {}
    hoisted = _hoist_defs(spec, root_defs)
    root = {"properties": {"x": hoisted}}
    if root_defs:
        root["$defs"] = root_defs
    res = CheckSuite(root).run(df, key="id")
    failing = {int(r["doc_id"]) for r in
               res.violations.select("doc_id").distinct().collect()}
    expected = {i for i, x in enumerate(xs) if not _py_eval(spec, x)}
    assert failing == expected, (spec, xs)


# --- continuation-wave keywords: monotonic / rowCount / tokenShape ---------

_mono_rows = st.lists(
    st.tuples(st.integers(0, 3),                       # group
              st.integers(0, 9),                       # order (ties likely)
              st.one_of(st.none(), st.integers(-9, 9))),  # value
    min_size=1, max_size=20)
_dirs = st.sampled_from(
    ["nonDecreasing", "increasing", "nonIncreasing", "decreasing"])


def _py_monotonic(rows, direction):
    """Reference semantics: per group, order by (order, doc_id); a row
    violates vs its immediate predecessor; NULL pairs never violate."""
    import operator
    op = {"nonDecreasing": operator.lt, "increasing": operator.le,
          "nonIncreasing": operator.gt, "decreasing": operator.ge}[direction]
    bad = set()
    by_grp = {}
    for i, (g, o, v) in enumerate(rows):
        by_grp.setdefault(g, []).append((o, i, v))
    for g, rs in by_grp.items():
        rs.sort()
        for (_, _, pv), (_, i, cv) in zip(rs, rs[1:]):
            if pv is not None and cv is not None and op(cv, pv):
                bad.add(str(i))
    return bad


@SETTINGS
@given(rows=_mono_rows, direction=_dirs)
def test_monotonic_matches_python_oracle(spark, rows, direction):
    df = spark.createDataFrame(
        [(i, g, o, v) for i, (g, o, v) in enumerate(rows)],
        "doc_id: long, grp: long, seq: long, v: long")
    suite = CheckSuite({"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "by": "grp", "direction": direction}}}})
    res = suite.run(df.repartition(4), key="doc_id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == _py_monotonic(rows, direction)


@SETTINGS
@given(groups=st.lists(st.integers(0, 4), min_size=1, max_size=25),
       lo=st.integers(0, 4), hi=st.integers(2, 8))
def test_rowcount_matches_python_oracle(spark, groups, lo, hi):
    from collections import Counter

    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)], "doc_id: long, g: long")
    suite = CheckSuite({"properties": {"g": {"x-rowCount": {
        "min": lo, "max": hi}}}})
    res = suite.run(df, key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    exp = {str(g): f"count={n}" for g, n in Counter(groups).items()
           if n < lo or n > hi}
    assert got == exp


_tok_arrays = st.lists(
    st.one_of(st.none(),
              st.lists(st.integers(-2, 6), min_size=0, max_size=8)),
    min_size=1, max_size=15)


def _py_tokenshape(arrs, prefix, suffix, forbidden, pad):
    bad = {}
    for i, a in enumerate(arrs):
        if a is None:
            continue
        parts = []
        if a[:len(prefix)] != prefix:
            parts.append("badPrefix")
        if a[max(len(a) - len(suffix), 0):] != suffix:
            parts.append("badSuffix")
        hits = [t for t in a if t in forbidden]
        if hits:
            parts.append(f"forbidden={hits[0]}")
        if pad in a:
            p = a.index(pad)
            if any(t != pad for t in a[p:]):
                parts.append("interiorPad")
        if parts:
            bad[str(i)] = ",".join(parts)
    return bad


@SETTINGS
@given(arrs=_tok_arrays,
       prefix=st.lists(st.integers(0, 4), min_size=1, max_size=2),
       suffix=st.lists(st.integers(0, 4), min_size=1, max_size=2),
       forbidden=st.lists(st.integers(-2, 2), min_size=1, max_size=2,
                          unique=True),
       pad=st.integers(0, 4))
def test_tokenshape_matches_python_oracle(spark, arrs, prefix, suffix,
                                          forbidden, pad):
    df = spark.createDataFrame(
        list(enumerate(arrs)), "doc_id: long, tokens: array<long>")
    suite = CheckSuite({"properties": {"tokens": {"x-tokenShape": {
        "startsWith": prefix, "endsWith": suffix,
        "forbidden": forbidden, "pad": pad}}}})
    res = suite.run(df, key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == _py_tokenshape(arrs, prefix, suffix, forbidden, pad)


_cov_vals = st.lists(
    st.one_of(st.none(), st.sampled_from(["s1", "s2", "s3", "junk", "x"])),
    min_size=1, max_size=15)
_cov_dom = st.lists(st.sampled_from(["s1", "s2", "s3", "s4"]),
                    min_size=1, max_size=4, unique=True)


@SETTINGS
@given(xs=_cov_vals, dom=_cov_dom,
       tau=st.floats(min_value=0.1, max_value=1.0))
def test_domain_coverage_matches_python(spark, xs, dom, tau):
    """domain_coverage (r5): coverage == |domain ∩ seen| / |domain| for
    ANY value mix — junk and NULLs contribute nothing; the coverageMin
    verdict thresholds on exactly that fraction."""
    from jsonschema_valid_spark.operators.referential import domain_coverage

    df = spark.createDataFrame(
        [(f"r{i}", x) for i, x in enumerate(xs)], "id string, src string")
    row = domain_coverage(df, "src", dom).first()
    seen = {x for x in xs if x in set(dom)}
    assert (row["n_domain"], row["n_seen"]) == (len(dom), len(seen))
    assert row["coverage"] == pytest.approx(len(seen) / len(dom))
    res = CheckSuite({"properties": {"src": {"x-referential": {
        "domain": list(dom), "coverageMin": tau}}}}).run(df, key="id")
    cov = [r for r in res.verdicts.collect()
           if r["check_id"].endswith("/coverage")][0]
    assert cov["passed"] == (len(seen) / len(dom) >= tau - 1e-9)
