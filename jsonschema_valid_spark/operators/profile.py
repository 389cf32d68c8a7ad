"""One-pass column profiling and constraint suggestion.

A validation engine needs a bootstrap path: before anyone writes a
CheckSuite by hand, profile the table once and SUGGEST the suite
(the reference has no analog — its suites are hand-authored JSON,
config.rs:12-16; this is the dataset-scope lift a 10^12-row table needs,
in the spirit of Deequ's ConstraintSuggestion).

Scale design:

* :func:`profile_columns` computes EVERY per-column statistic in ONE
  ``df.agg(...)`` — a single scan with map-side partial aggregation and a
  one-row result; the per-column unpivot happens on that single row
  (``inline`` of a literal-built struct array), never a second scan.
  ``distinct="exact"`` uses ``count(DISTINCT col)`` — Spark plans multiple
  distinct aggregates via an Expand (row multiplication × #profiled
  columns), which is the honest cost of exactness and what the DuckDB
  oracle can replay. ``distinct="approx"`` (production default at scale)
  is HLL++ ``approx_count_distinct``: truly one pass, no Expand.
* :func:`suggest_constraints` is a pure projection over the (tiny)
  profile — deterministic rule ladder, SQL-replayable.
* :func:`suite_from_profile` materializes a runnable :class:`CheckSuite`
  dict. Only the ``enum`` rule needs actual values; they are collected
  with a hard ``enum_max`` bound (driver-sized by construction).

The suggested suite is self-consistent: running it over the profiled
DataFrame yields zero violations (pytest-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DateType, DoubleType, FloatType, IntegralType,
    NumericType, StringType, TimestampType,
)

_PROFILE_FIELDS = (
    "col_name", "dtype", "n_rows", "n_null", "null_rate", "n_distinct",
    "min_str", "max_str", "mean", "stddev", "avg_len", "max_len",
)


def _is_numeric(dt) -> bool:
    return isinstance(dt, NumericType)


def _len_expr(name: str, dt):
    if isinstance(dt, StringType):
        return F.length(F.col(name))
    if isinstance(dt, ArrayType):
        return F.size(F.col(name))
    return None


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: str = "approx",
    by: str | None = None,
) -> DataFrame:
    """One row per column: counts, null rate, distinct, min/max (as
    strings), mean/stddev (numeric), value length stats (string/array).

    ``distinct``: ``"approx"`` (HLL++, single pass — the 100 TB default)
    or ``"exact"`` (COUNT DISTINCT via Expand — oracle-replayable).

    ``by``: per-group profiling — the north-star "per-partition column
    stats via groupBy().agg" in one pass: output gains a leading ``grp``
    column, still one scan (the groupBy carries every aggregate with
    map-side partial combine; result size = #groups × #columns).
    """
    if distinct not in ("approx", "exact"):
        raise ValueError(f"distinct must be 'approx' or 'exact', got {distinct!r}")
    names = cols if cols is not None else [c for c in df.columns if c != by]
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [n for n in names if n not in schema]
    if missing:
        raise ValueError(f"profile_columns: columns {missing} not in DataFrame")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, n in enumerate(names):
        dt = schema[n]
        c = F.col(n)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias(f"__null_{i}"))
        if distinct == "exact":
            aggs.append(F.count_distinct(c).alias(f"__dist_{i}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__dist_{i}"))
        if isinstance(dt, (ArrayType,)):
            # min/max of arrays is not portable across engines — skip.
            aggs.append(F.lit(None).cast("string").alias(f"__min_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{i}"))
        elif isinstance(dt, (FloatType, DoubleType)):
            aggs.append(F.round(F.min(c), 6).cast("string").alias(f"__min_{i}"))
            aggs.append(F.round(F.max(c), 6).cast("string").alias(f"__max_{i}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{i}"))
        if _is_numeric(dt):
            aggs.append(F.round(F.avg(c), 6).alias(f"__mean_{i}"))
            aggs.append(F.round(F.stddev_samp(c), 6).alias(f"__std_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mean_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__std_{i}"))
        le = _len_expr(n, dt)
        if le is not None:
            aggs.append(F.round(F.avg(le), 6).alias(f"__avglen_{i}"))
            aggs.append(F.max(le).cast("long").alias(f"__maxlen_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__avglen_{i}"))
            aggs.append(F.lit(None).cast("long").alias(f"__maxlen_{i}"))

    if by is not None:
        wide = df.groupBy(F.col(by).cast("string").alias("grp")).agg(*aggs)
    else:
        wide = df.agg(*aggs)

    structs = []
    for i, n in enumerate(names):
        dt = schema[n]
        structs.append(F.struct(
            F.lit(n).alias("col_name"),
            F.lit(dt.simpleString()).alias("dtype"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__null_{i}").alias("n_null"),
            F.when(F.col("__n_rows") > 0,
                   F.round(F.col(f"__null_{i}") / F.col("__n_rows"), 6))
             .otherwise(F.lit(0.0)).alias("null_rate"),
            F.col(f"__dist_{i}").cast("long").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_str"),
            F.col(f"__max_{i}").alias("max_str"),
            F.col(f"__mean_{i}").alias("mean"),
            F.col(f"__std_{i}").alias("stddev"),
            F.col(f"__avglen_{i}").alias("avg_len"),
            F.col(f"__maxlen_{i}").alias("max_len"),
        ))
    if by is not None:
        return wide.select("grp", F.inline(F.array(*structs))).select(
            "grp", *_PROFILE_FIELDS)
    return wide.select(F.inline(F.array(*structs))).select(*_PROFILE_FIELDS)


# ---------------------------------------------------------------------------
# Constraint suggestion: deterministic rule ladder over the profile rows
# ---------------------------------------------------------------------------

_JSON_TYPE = {
    "integer": ("tinyint", "smallint", "int", "bigint"),
    "number": ("float", "double", "decimal"),
    "string": ("string",),
    "boolean": ("boolean",),
    "array": ("array",),
}


def _json_type_expr():
    dt = F.col("dtype")
    e = F.lit(None).cast("string")
    e = F.when(dt.isin("tinyint", "smallint", "int", "bigint"), "integer") \
         .when(dt.isin("float", "double") | dt.startswith("decimal"), "number") \
         .when(dt == "string", "string") \
         .when(dt == "boolean", "boolean") \
         .when(dt.startswith("array"), "array") \
         .otherwise(e)
    return e


def suggest_constraints(profile: DataFrame, enum_max: int = 20) -> DataFrame:
    """Rule ladder → one row per suggested keyword:
    ``(col_name, keyword, param_num, param_txt)``.

    Rules (each a pure expression over the profile row — the DuckDB oracle
    replays them verbatim):

    * known dtype         → ``type`` (param_txt = JSON-schema type)
    * n_null = 0, n_rows>0→ ``required``
    * n_null > 0          → ``x-nullRate`` max, observed rate rounded UP
      to 2 decimals (headroom so the suite passes on the profiled data)
    * n_distinct = n_rows, scalar dtype → ``x-unique``
    * numeric             → ``minimum`` / ``maximum`` = observed range
    * string              → ``maxLength`` = observed max length
    * string, 1 < n_distinct ≤ enum_max < n_rows → ``enum``
      (param_num = cardinality; values fetched by :func:`suite_from_profile`)

    ``x-unique`` intentionally requires exact-distinct profiles: with
    ``distinct="approx"`` HLL error makes ``n_distinct = n_rows`` untrustworthy,
    so the rule also demands ``n_null = 0`` and is documented as advisory.
    """
    p = profile
    jt = _json_type_expr()
    scalar = ~F.col("dtype").startswith("array")

    rules = [
        F.when(jt.isNotNull(),
               F.struct(F.lit("type").alias("keyword"),
                        F.lit(None).cast("double").alias("param_num"),
                        jt.alias("param_txt"))),
        F.when((F.col("n_null") == 0) & (F.col("n_rows") > 0),
               F.struct(F.lit("required").alias("keyword"),
                        F.lit(None).cast("double").alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
        F.when(F.col("n_null") > 0,
               F.struct(F.lit("x-nullRate").alias("keyword"),
                        (F.ceil(F.col("null_rate") * 100) / F.lit(100.0)).alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
        F.when((F.col("n_distinct") == F.col("n_rows")) & (F.col("n_rows") > 0)
               & (F.col("n_null") == 0) & scalar,
               F.struct(F.lit("x-unique").alias("keyword"),
                        F.lit(None).cast("double").alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
        F.when(jt.isin("integer", "number") & F.col("min_str").isNotNull(),
               F.struct(F.lit("minimum").alias("keyword"),
                        F.col("min_str").cast("double").alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
        F.when(jt.isin("integer", "number") & F.col("max_str").isNotNull(),
               F.struct(F.lit("maximum").alias("keyword"),
                        F.col("max_str").cast("double").alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
        F.when((jt == "string") & F.col("max_len").isNotNull(),
               F.struct(F.lit("maxLength").alias("keyword"),
                        F.col("max_len").cast("double").alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
        F.when((jt == "string") & (F.col("n_distinct") > 1)
               & (F.col("n_distinct") <= enum_max)
               & (F.col("n_distinct") < F.col("n_rows")),
               F.struct(F.lit("enum").alias("keyword"),
                        F.col("n_distinct").cast("double").alias("param_num"),
                        F.lit(None).cast("string").alias("param_txt"))),
    ]
    exploded = p.select(
        "col_name",
        F.explode(F.filter(F.array(*rules), lambda x: x.isNotNull())).alias("s"),
    )
    return exploded.select(
        "col_name",
        F.col("s.keyword").alias("keyword"),
        F.round(F.col("s.param_num"), 6).alias("param_num"),
        F.col("s.param_txt").alias("param_txt"),
    )


def suite_from_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    enum_max: int = 20,
    key: str | None = None,
) -> dict:
    """Profile ``df`` (exact distincts — the suggestion rules need them)
    and materialize the suggested suite as a runnable CheckSuite spec.

    ``enum`` values are collected only for columns the ladder flagged,
    bounded by ``enum_max`` per column (driver-sized). ``key`` (if given)
    is excluded from ``x-unique`` duplication with itself — it simply keeps
    its suggested uniqueness check; the arg exists so callers can assert
    the key column got one.
    """
    prof = profile_columns(df, cols=cols, distinct="exact")
    sugg = suggest_constraints(prof, enum_max=enum_max).collect()

    by_col: dict[str, dict] = {}
    required: list[str] = []
    enum_cols: list[str] = []
    for r in sugg:
        node = by_col.setdefault(r["col_name"], {})
        kw = r["keyword"]
        if kw == "type":
            node["type"] = r["param_txt"]
        elif kw == "required":
            required.append(r["col_name"])
        elif kw == "x-nullRate":
            node["x-nullRate"] = {"max": r["param_num"]}
        elif kw == "x-unique":
            node["x-unique"] = True
        elif kw == "minimum":
            v = r["param_num"]
            node["minimum"] = int(v) if node.get("type") == "integer" else v
        elif kw == "maximum":
            v = r["param_num"]
            node["maximum"] = int(v) if node.get("type") == "integer" else v
        elif kw == "maxLength":
            node["maxLength"] = int(r["param_num"])
        elif kw == "enum":
            enum_cols.append(r["col_name"])

    for c in enum_cols:
        vals = [row[0] for row in
                df.select(c).where(F.col(c).isNotNull())
                  .distinct().orderBy(c).limit(enum_max + 1).collect()]
        if len(vals) <= enum_max:  # re-check: profile and fetch race on appends
            by_col[c]["enum"] = vals

    spec: dict = {"type": "object", "properties": by_col}
    if required:
        spec["required"] = sorted(required)
    return spec


def suggest_row_count_bounds(df: DataFrame, column: str,
                             headroom: float = 2.0) -> dict | None:
    """Bootstrap an ``x-rowCount`` node from the observed per-group count
    range, widened by ``headroom`` on both sides (observed min ÷ headroom,
    observed max × headroom) — the suggested bounds pass on the profiled
    table by construction and leave room for organic growth, the same
    round-up-for-headroom contract as the x-nullRate suggestion.

    One count aggregate; only the two-value (min, max) summary reaches
    the driver. Returns None on an empty table. Standalone on purpose:
    :func:`suggest_constraints` stays a pure per-column projection the
    DuckDB oracle replays verbatim, while this needs a second (group-
    cardinality) aggregate — callers attach the node to the group column
    explicitly."""
    if headroom < 1.0:
        raise ValueError(f"headroom must be >= 1.0, got {headroom}")
    r = (df.groupBy(column).agg(F.count(F.lit(1)).alias("n"))
         .agg(F.min("n").alias("mn"), F.max("n").alias("mx")).first())
    if r["mn"] is None:
        return None
    import math

    return {"min": int(r["mn"] // headroom),
            "max": int(math.ceil(r["mx"] * headroom))}


def suggest_drift_baseline(df: DataFrame, column: str,
                           bucket_width: float | None = None,
                           n_buckets: int = 32,
                           psi_max: float = 0.25,
                           mode: str = "width") -> dict | None:
    """Bootstrap an ``x-drift`` node from the column's OWN histogram —
    closing the profile → suite loop for the drift family the way
    :func:`suggest_row_count_bounds` does for cardinality: profile a
    trusted snapshot once, pin its distribution as the baseline, and
    every later load is tested against it.

    ``mode="width"`` (default): fixed-width bins; ``bucket_width=None``
    derives a width from the observed range (range / ``n_buckets``,
    snapped to a power of two so bucket edges are stable against tiny
    range jitter between snapshots). One min/max aggregate plus one
    histogram aggregate; only #buckets rows reach the driver.

    ``mode="quantile"``: EQUI-DEPTH bins — edges at the snapshot's own
    exact percentiles (deduped to stay strictly increasing), emitted as
    an ``edges`` node so every bucket carries equal baseline mass: the
    right shape for heavy-tailed columns, where fixed widths starve the
    tail into one mega-bucket and shatter the body into noise-dominated
    slivers. Exact ``percentile`` is a sort-based aggregate — fine at
    profile time on a trusted snapshot, not a per-load cost (the emitted
    check itself stays one histogram aggregate per load).

    The suggested node passes on the profiled table by construction
    (PSI of a distribution against itself is 0). Returns None when the
    column has no non-NULL rows."""
    from jsonschema_valid_spark.operators.drift import (
        histogram,
        quantile_histogram,
    )

    if mode not in ("width", "quantile"):
        raise ValueError(f"mode must be 'width' or 'quantile', got {mode!r}")
    if mode == "quantile":
        qs = [i / float(n_buckets) for i in range(1, int(n_buckets))]
        r = df.agg(F.percentile(F.col(column).cast("double"),
                                F.array(*[F.lit(q) for q in qs]))
                   .alias("es")).first()
        if r["es"] is None:
            return None
        edges: list[float] = []
        for e in r["es"]:
            if e is not None and (not edges or float(e) > edges[-1]):
                edges.append(float(e))
        if not edges:
            # constant column: a single degenerate edge still yields a
            # two-bucket histogram with all mass in bucket 1
            mn = df.agg(F.min(F.col(column).cast("double"))).first()[0]
            edges = [float(mn)]
        rows = quantile_histogram(df, column, edges).collect()
        if not rows:
            return None
        return {"baseline": {int(r["bucket"]): int(r["count"])
                             for r in rows},
                "edges": edges, "psiMax": float(psi_max)}
    if bucket_width is None:
        r = df.agg(F.min(F.col(column).cast("double")).alias("mn"),
                   F.max(F.col(column).cast("double")).alias("mx")).first()
        if r["mn"] is None:
            return None
        spread = float(r["mx"]) - float(r["mn"])
        import math

        bucket_width = (2.0 ** math.ceil(math.log2(spread / n_buckets))
                        if spread > 0 else 1.0)
    rows = histogram(df, column, float(bucket_width)).collect()
    if not rows:
        return None
    return {"baseline": {int(r["bucket"]): int(r["count"]) for r in rows},
            "bucketWidth": float(bucket_width),
            "psiMax": float(psi_max)}


def suggest_frequency_cap(df: DataFrame, column: str,
                          headroom: float = 1.5,
                          floor: float = 0.01) -> dict | None:
    """Bootstrap an ``x-maxFrequency`` node from the snapshot's own TOP
    value share — the dominance analog of :func:`suggest_drift_baseline`:
    profile a trusted load once, pin ``maxFraction`` at the observed top
    share x ``headroom`` (ceil'd to the check's micro resolution, floored
    at ``floor`` so organically tiny shares don't pin a hair-trigger
    cap), and every later load fails if any value's share grows past it
    — the stuck-producer / template-flood / mode-collapse guard. Passes
    on the profiled table by construction (headroom > 1). One exact
    count aggregate; returns None on an all-NULL column."""
    import math

    if headroom <= 1.0:
        raise ValueError(f"headroom must be > 1, got {headroom}")
    from jsonschema_valid_spark.operators.frequency import (
        exact_value_counts,
    )

    top = (exact_value_counts(df, column)
           .orderBy(F.col("n").desc()).limit(1).collect())
    if not top:
        return None
    share = top[0]["n"] / float(top[0]["total"])
    # ceil to the check's micro grid, with an epsilon so float artifacts
    # (0.2 * 1.5 = 0.30000000000000004) don't bump an exact grid point up
    frac = min(1.0, max(float(floor),
                        math.ceil(share * headroom * 1e6 - 1e-6) / 1e6))
    return {"maxFraction": frac}


def profile_diff(
    cur: DataFrame,
    ref: DataFrame,
    null_rate_tol: float = 0.05,
    mean_sigmas: float = 3.0,
    distinct_ratio: float = 2.0,
) -> DataFrame:
    """Schema/distribution drift between two :func:`profile_columns`
    snapshots — the rewrite-validation question "did the NEW load still
    look like the table we validated last week" asked at profile grain,
    before any row-level check runs.

    ``cur``/``ref`` are plain (un-grouped) profiles. Emits ONE row per
    drifted (column, aspect):

    * ``added`` / ``removed`` — column present on one side only
    * ``dtype`` — type string changed
    * ``null_rate`` — |cur − ref| > ``null_rate_tol``
    * ``mean`` — |cur − ref| > ``mean_sigmas`` · ref stddev (numeric
      columns with a positive reference spread)
    * ``distinct`` — cardinality ratio outside
      [1/``distinct_ratio``, ``distinct_ratio``]

    Output: (col_name, aspect, cur_v, ref_v) with decimal renderings so
    the rows replay identically in any ANSI engine. Scale: both inputs
    are #columns-row relations — the full-outer join and aspect
    projection never touch row data (the expensive part was the two
    one-pass profile scans, already done). Complements
    :mod:`operators/reconcile <jsonschema_valid_spark.operators.reconcile>`:
    reconcile proves value-level equality of two tables; this flags
    STATISTICAL change between two points in time, where exact equality
    is not even expected."""
    c = cur.select([F.col(f).alias(f"c_{f}") for f in _PROFILE_FIELDS])
    r = ref.select([F.col(f).alias(f"r_{f}") for f in _PROFILE_FIELDS])
    j = c.join(r, c["c_col_name"].eqNullSafe(r["r_col_name"]), "full_outer")

    def _dec(col, scale):
        return F.coalesce(col.cast(f"decimal(20,{scale})").cast("string"),
                          F.lit("<null>"))

    both = F.col("c_col_name").isNotNull() & F.col("r_col_name").isNotNull()
    name = F.coalesce(F.col("c_col_name"), F.col("r_col_name"))
    dratio = (F.col("c_n_distinct").cast("double")
              / F.col("r_n_distinct").cast("double"))
    aspects = [
        F.when(F.col("r_col_name").isNull(), F.struct(
            F.lit("added").alias("aspect"),
            F.col("c_dtype").alias("cur_v"),
            F.lit("<absent>").alias("ref_v"))),
        F.when(F.col("c_col_name").isNull(), F.struct(
            F.lit("removed").alias("aspect"),
            F.lit("<absent>").alias("cur_v"),
            F.col("r_dtype").alias("ref_v"))),
        F.when(both & (F.col("c_dtype") != F.col("r_dtype")), F.struct(
            F.lit("dtype").alias("aspect"),
            F.col("c_dtype").alias("cur_v"),
            F.col("r_dtype").alias("ref_v"))),
        F.when(both & (F.abs(F.col("c_null_rate") - F.col("r_null_rate"))
                       > float(null_rate_tol)), F.struct(
            F.lit("null_rate").alias("aspect"),
            _dec(F.col("c_null_rate"), 4).alias("cur_v"),
            _dec(F.col("r_null_rate"), 4).alias("ref_v"))),
        F.when(both & F.col("c_mean").isNotNull()
               & F.col("r_mean").isNotNull()
               & F.col("r_stddev").isNotNull() & (F.col("r_stddev") > 0)
               & (F.abs(F.col("c_mean") - F.col("r_mean"))
                  > float(mean_sigmas) * F.col("r_stddev")), F.struct(
            F.lit("mean").alias("aspect"),
            _dec(F.col("c_mean"), 4).alias("cur_v"),
            _dec(F.col("r_mean"), 4).alias("ref_v"))),
        F.when(both & (F.col("c_n_distinct") > 0)
               & (F.col("r_n_distinct") > 0)
               & ((dratio > float(distinct_ratio))
                  | (dratio < 1.0 / float(distinct_ratio))), F.struct(
            F.lit("distinct").alias("aspect"),
            F.col("c_n_distinct").cast("string").alias("cur_v"),
            F.col("r_n_distinct").cast("string").alias("ref_v"))),
    ]
    return (
        j.select(name.alias("col_name"),
                 F.explode(F.array_compact(F.array(*aspects))).alias("a"))
        .select("col_name", "a.aspect", "a.cur_v", "a.ref_v")
    )


def string_signatures(df: DataFrame, column: str,
                      collapse: bool = True) -> DataFrame:
    """``(signature, cnt)``: the character-class TEMPLATE histogram of a
    string column — uppercase runs → ``A``, lowercase → ``a``, digits →
    ``9``, everything else kept literally (Deequ/Great-Expectations-
    style format profiling).  ``collapse=True`` squeezes repeat runs to
    one symbol, so "25-989-741-2988" and "1-23-4-5" share the signature
    ``9-9-9-9``: format identity, not length identity.

    One map-side-combined aggregate over a pure projection (three
    chained ``regexp_replace`` — JVM codegen, no UDF); the result is
    #signatures rows.  NULLs carry no signature and are excluded.
    Replayable verbatim in DuckDB (``regexp_replace(..., 'g')``)."""
    sig = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(column), "[A-Z]", "A"),
            "[a-z]", "a"),
        "[0-9]", "9")
    if collapse:
        sig = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(sig, "A+", "A"), "a+", "a"), "9+", "9")
    return (df.where(F.col(column).isNotNull())
            .groupBy(sig.alias("signature"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def suggest_string_pattern(df: DataFrame, column: str,
                           min_coverage: float = 0.95,
                           max_signatures: int = 100) -> str | None:
    """Suggest an anchored regex for ``column`` from its collapsed
    signature histogram, or None when the column has no dominant
    format.  Signatures are taken greedily by frequency until they
    cover ``min_coverage`` of non-NULL rows; each becomes an alternation
    branch (``A``→``[A-Z]+``, ``a``→``[a-z]+``, ``9``→``[0-9]+``, other
    chars escaped).  Collapse→quantifier generalization only WIDENS, so
    the signature coverage is a lower bound on the pattern's true
    coverage.  Bounded: only the top ``max_signatures`` histogram rows
    (TakeOrderedAndProject) ever reach the driver — a column with more
    formats than that has no suggestable pattern and returns None.
    The result is plain character-class regex, valid in both Java
    (``pattern`` keyword rlike) and DuckDB."""
    _META = set(".^$*+?()[]{}|\\")

    rows = (string_signatures(df, column, collapse=True)
            .orderBy(F.col("cnt").desc(), F.col("signature"))
            .limit(int(max_signatures)).collect())
    total_row = (df.where(F.col(column).isNotNull())
                 .agg(F.count(F.lit(1)).alias("n")).collect()[0])
    total = total_row["n"]
    if total == 0 or not rows:
        return None
    kept, covered = [], 0
    for r in rows:
        kept.append(r["signature"])
        covered += r["cnt"]
        if covered / total >= float(min_coverage):
            break
    if covered / total < float(min_coverage):
        return None

    def _branch(sig: str) -> str:
        out = []
        for ch in sig:
            if ch == "A":
                out.append("[A-Z]+")
            elif ch == "a":
                out.append("[a-z]+")
            elif ch == "9":
                out.append("[0-9]+")
            elif ch in _META:
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    return "^(?:" + "|".join(_branch(s) for s in sorted(kept)) + ")$"


def suggest_distinct_ratio_bounds(df: DataFrame, column: str,
                                  by: str | None = None,
                                  headroom: float = 2.0,
                                  min_count: int = 5) -> dict | None:
    """Bootstrap an ``x-distinctRatio`` node from the snapshot's own
    observed ratios — the rate analog of :func:`suggest_frequency_cap`:
    profile a trusted load once, pin ``min`` at the WORST observed
    per-group ratio shrunk by ``headroom`` (a later load whose ratio
    collapses past the historical floor — fan-out duplication, id
    collapse — fails; organic variation inside the headroom passes).
    Groups under ``min_count`` rows are ignored while profiling (thin
    groups have noisy ratios).  Passes on the profiled table by
    construction (headroom > 1).  One aggregate; returns None when no
    group clears ``min_count``."""
    if headroom <= 1.0:
        raise ValueError(f"headroom must be > 1, got {headroom}")
    c = F.col(column)
    aggs = [F.count_distinct(c).alias("d"), F.count(c).alias("n")]
    if by is not None:
        g = df.groupBy(F.col(by)).agg(*aggs)
    else:
        g = df.agg(*aggs)
    worst = (g.where(F.col("n") >= int(min_count))
             .agg(F.min(F.try_divide(F.col("d"), F.col("n")))
                  .alias("r")).collect()[0]["r"])
    if worst is None:
        return None
    import math

    # floor to the micro grid (epsilon guards exact grid points)
    lo = max(0.0, math.floor(worst / float(headroom) * 1e6 + 1e-6) / 1e6)
    node: dict = {"min": lo, "minCount": int(min_count)}
    if by is not None:
        node["by"] = by
    return node


def suggest_compliance_floor(df: DataFrame, column: str, expr: str,
                             by: str | None = None,
                             headroom: float = 1.5,
                             min_count: int = 5) -> dict | None:
    """Bootstrap an ``x-compliance`` node from the snapshot's own
    observed pass-rates: pin ``min`` at the WORST observed per-group
    rate of ``expr`` shrunk by ``headroom`` — a later load whose rate
    collapses past the historical floor fails; organic variation inside
    the headroom passes.  NULL predicate results count as
    non-compliant, matching the keyword.  Returns None when no group
    clears ``min_count``."""
    if headroom <= 1.0:
        raise ValueError(f"headroom must be > 1, got {headroom}")
    ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
    aggs = [F.sum(ok.cast("long")).alias("p"),
            F.count(F.lit(1)).alias("n")]
    g = df.groupBy(F.col(by)).agg(*aggs) if by is not None \
        else df.agg(*aggs)
    worst = (g.where(F.col("n") >= int(min_count))
             .agg(F.min(F.try_divide(F.col("p"), F.col("n")))
                  .alias("r")).collect()[0]["r"])
    if worst is None:
        return None
    import math

    lo = max(0.0, math.floor(worst / float(headroom) * 1e6 + 1e-6) / 1e6)
    node: dict = {"expr": expr, "min": lo, "minCount": int(min_count)}
    if by is not None:
        node["by"] = by
    return node


def suggest_trend_bounds(df: DataFrame, column: str, order_by: str,
                         by: str | None = None,
                         headroom: float = 2.0,
                         min_count: int = 5) -> dict | None:
    """Bootstrap an ``x-trend`` node: bound the slope by the WIDEST
    observed per-group slope x ``headroom`` symmetrically — a later
    load whose rate-of-change escapes the historical envelope fails.
    Groups under ``min_count`` pairs are ignored.  Returns None when no
    defined slope survives the count filter (e.g. constant
    ``order_by``)."""
    if headroom <= 1.0:
        raise ValueError(f"headroom must be > 1, got {headroom}")
    from jsonschema_valid_spark.operators.trend import trend_slopes

    g = trend_slopes(df, column, order_by, by=by)
    peak = (g.where(F.col("n") >= int(min_count))
            .agg(F.max(F.abs(F.col("slope"))).alias("m"))
            .collect()[0]["m"])
    if peak is None:
        return None
    import math

    hi = math.ceil(peak * float(headroom) * 1e6 + 1e-6) / 1e6
    node: dict = {"orderBy": order_by, "min": -hi, "max": hi,
                  "minCount": int(min_count)}
    if by is not None:
        node["by"] = by
    return node


def suggest_referential(fact: DataFrame, column: str,
                        domain: DataFrame, domain_column: str,
                        domain_name: str,
                        tolerance: float = 0.0) -> dict:
    """Inclusion-dependency discovery: does ``fact.column`` ⊆
    ``domain.domain_column`` hold on this snapshot?  The profile
    bootstrap for ``x-referential`` — the one constraint family
    :func:`suggest_constraints` cannot see because its subject is a
    RELATIONSHIP between tables, not a column's own distribution.

    One pass: the fact side collapses to its distinct values (map-side
    combined — #distinct rows, not #rows, meet the join), left-joins the
    domain's distinct keys, and a single conditional aggregate counts
    hits and misses; only the two counts reach the driver.  No broadcast
    is forced — AQE picks the join strategy, so a 10^9-key domain
    neither OOMs the driver (the x-referential inline guard's concern)
    nor blocks discovery.

    Returns ``{"column", "domain", "domainColumn", "distinct",
    "missing", "missRatio", "contained", "node"}`` where ``node`` is a
    ready ``x-referential`` spec ``{"domain": "@<domain_name>",
    "domainColumn": …}`` when the observed miss ratio is within
    ``tolerance`` (default: exact containment required), else None —
    callers register the domain table under ``domain_name`` in the
    suite context, the ``@`` indirection x-referential already resolves.
    """
    if not (0.0 <= float(tolerance) < 1.0):
        raise ValueError(f"tolerance must be in [0, 1), got {tolerance}")
    fd = (fact.select(F.col(column).alias("__v"))
          .where(F.col("__v").isNotNull()).distinct())
    dd = (domain.select(F.col(domain_column).alias("__v"))
          .where(F.col("__v").isNotNull()).distinct()
          .withColumn("__hit", F.lit(1)))
    r = (fd.join(dd, "__v", "left")
         .agg(F.count(F.lit(1)).alias("d"),
              F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
              .alias("miss"))
         .collect()[0])
    d, miss = int(r["d"] or 0), int(r["miss"] or 0)
    ratio = (miss / d) if d else 0.0
    contained = d > 0 and ratio <= float(tolerance)
    node = ({"domain": f"@{domain_name}", "domainColumn": domain_column}
            if contained else None)
    return {"column": column, "domain": domain_name,
            "domainColumn": domain_column, "distinct": d,
            "missing": miss, "missRatio": ratio,
            "contained": contained, "node": node}


def suggest_entropy_bounds(df: DataFrame, column: str,
                           by: str | None = None,
                           pad: float = 0.15,
                           min_count: int = 10) -> dict | None:
    """Bootstrap an ``x-entropy`` node from the snapshot's own observed
    per-group Shannon entropies — the diversity analog of
    :func:`suggest_frequency_cap`: profile a trusted load once, pin the
    floor at the WORST (lowest) group's entropy minus ``pad`` bits and
    the ceiling at the best plus ``pad``, and every later load fails if
    any group's mix collapses below the floor (mode collapse, stuck
    source) or fragments past the ceiling.  Passes on the profiled
    table by construction (pad > 0).  One contingency aggregate over
    #cells rows (operators/entropy.py plan); groups under ``min_count``
    rows are ignored for bound-setting (their entropy is noise).
    Bounds are floored at 0 and rounded to the check's 1e-4 witness
    grid (floor down, ceiling up).  Returns None when no group clears
    ``min_count`` (nothing trustworthy to learn from)."""
    import math

    if not (0.0 < float(pad)):
        raise ValueError(f"pad must be > 0, got {pad}")
    from jsonschema_valid_spark.operators.entropy import _entropy_stats

    g = _entropy_stats(df, column, by, normalized=False)
    r = (g.where(F.col("__n") >= F.lit(int(min_count)))
         .agg(F.min("__h").alias("lo"), F.max("__h").alias("hi"))
         .collect()[0])
    if r["lo"] is None:
        return None
    lo = max(0.0, math.floor((float(r["lo"]) - float(pad)) * 1e4) / 1e4)
    hi = math.ceil((float(r["hi"]) + float(pad)) * 1e4) / 1e4
    node: dict = {"min": lo, "max": hi, "minCount": int(min_count)}
    if by is not None:
        node["by"] = by
    return node


def suggest_seasonality_floor(df: DataFrame, column: str, key: str,
                              order_by: str, lag: int,
                              by: str | None = None,
                              pad: float = 0.1,
                              min_count: int = 10) -> dict | None:
    """Bootstrap an ``x-seasonality`` node from the snapshot's own
    observed per-group lag-``lag`` autocorrelations — the rhythm analog
    of :func:`suggest_trend_bounds`: profile a trusted load once, pin
    the floor at the WORST (lowest) group's acf minus ``pad``, and
    every later load fails if any group loses its periodic structure
    (scrambled ordering, dropped periodic driver).  Passes on the
    profiled table by construction (pad > 0).  Floor clamped to
    [-1, 1 - 1e-4] and rounded DOWN to the 1e-4 grid; groups under
    ``min_count`` complete pairs or with undefined acf are ignored
    (noise).  Returns None when nothing trustworthy survives — or when
    the observed worst acf is so low that the padded floor would be
    <= -1 (no rhythm to protect; a floor that can never fail is not a
    check)."""
    import math

    if not (0.0 < float(pad)):
        raise ValueError(f"pad must be > 0, got {pad}")
    from jsonschema_valid_spark.operators.seasonality import (
        seasonality_acf,
    )

    g = seasonality_acf(df, column, key, order_by, lag, by=by)
    r = (g.where(F.col("acf").isNotNull()
                 & (F.col("n") >= F.lit(int(min_count))))
         .agg(F.min("acf").alias("lo")).collect()[0])
    if r["lo"] is None:
        return None
    lo = math.floor((float(r["lo"]) - float(pad)) * 1e4) / 1e4
    if lo <= -1.0:
        return None
    lo = min(lo, 1.0 - 1e-4)
    node: dict = {"orderBy": order_by, "lag": int(lag), "min": lo,
                  "minCount": max(int(min_count), 3)}
    if by is not None:
        node["by"] = by
    return node


def suggest_anonymity_floors(df: DataFrame, quasi: list[str],
                             sensitive: str | None = None,
                             pad: float = 0.5) -> dict | None:
    """Bootstrap an ``x-kAnonymity`` node from the trusted snapshot's
    WORST quasi cell: k = the smallest observed cell size (padded DOWN
    by ``pad`` — floor(min·pad) — so organic volume wobble between
    releases doesn't trip a pinned-at-exact floor), and with
    ``sensitive`` l = the smallest observed per-cell sensitive
    diversity, padded the same way. Passes on the profiled table by
    construction (floors <= every observed cell); a later release whose
    worst cell shrinks below the padded floor — a singleton slips into
    the export, or a cell homogenizes — trips. Returns None when no
    floor >= 2 survives the pad (the snapshot's own worst cell is
    already too thin to gate on — k-anonymity needs curation first,
    not a vacuous suite). ONE count aggregate over #cells rows (plus
    the count_distinct Expand when ``sensitive`` is given)."""
    import math

    if not 0 < pad <= 1:
        raise ValueError(f"pad must be in (0, 1], got {pad}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("__d"))
    mins = (df.groupBy(*[F.col(c) for c in quasi]).agg(*aggs)
            .agg(F.min("__n").alias("mn"),
                 *([F.min("__d").alias("md")] if sensitive else []))
            .collect())
    if not mins or mins[0]["mn"] is None:
        return None
    k = math.floor(mins[0]["mn"] * pad)
    node: dict = {"quasi": list(quasi)}
    if k >= 2:
        node["k"] = k
    if sensitive is not None:
        l = math.floor(mins[0]["md"] * pad)  # noqa: E741
        if l >= 2:
            node["l"] = l
            node["sensitive"] = sensitive
    if "k" not in node and "l" not in node:
        return None
    return node
