"""Distribution-drift checks (PSI / KS) for a numeric column against a
baseline histogram (BASELINE.json north_star: "n_tok distribution-drift
(KS/PSI against a baseline histogram)").

No reference counterpart — the reference validates single documents; drift is
a dataset-scope invariant. Design:

* the baseline is a SMALL fixed-bin histogram (driver-side dict / tiny DF) —
  broadcast, never shuffled;
* the observed histogram is ONE ``groupBy(bucket).count()`` over the fact
  table (map-side partial aggregation; #buckets rows reach the reducers);
* PSI is computed natively on the joined histograms (a few hundred rows) —
  pure Column math, no UDF;
* KS uses the binned-ECDF approximation over the same histogram (error bound
  ≤ bin probability mass; bins are chosen at compile time — SURVEY.md §4.4).
  Computed via a window cumulative sum over #buckets rows — trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

EPS = 1e-9


def histogram(df: DataFrame, column: str, bucket_width: float) -> DataFrame:
    """Fixed-bin histogram: ``(bucket, count)``. One shuffle of #buckets rows
    after map-side combine."""
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(F.floor(F.col(column) / F.lit(bucket_width)).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def quantile_histogram(df: DataFrame, column: str,
                       edges: list[float]) -> DataFrame:
    """EQUI-DEPTH histogram: ``(bucket, count)`` where bucket = number of
    ``edges`` that are <= the value (so edges [e0..ek-1] define k+1
    buckets: (-inf, e0), [e0, e1), ..., [ek-1, inf)). Edges typically come
    from the BASELINE's quantiles (``suggest_drift_baseline(mode=
    "quantile")``), giving every bucket equal baseline mass — the drift
    statistics then weight the whole distribution evenly instead of
    letting fixed-width bins starve heavy tails into one mega-bucket and
    shatter the sparse range into noise-dominated slivers. The bucket
    expression is a literal-array HOF (no join, no UDF) and replays as
    ``len(list_filter(...))`` in the oracle; same one-shuffle
    #buckets-row plan as :func:`histogram`."""
    es = [float(e) for e in edges]
    if not es or sorted(es) != es or len(set(es)) != len(es):
        raise ValueError("edges must be a non-empty strictly increasing "
                         f"list, got {edges!r}")
    arr = F.array(*[F.lit(e) for e in es])
    v = F.col(column).cast("double")
    b = F.size(F.filter(arr, lambda e: v >= e))
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(b.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def categorical_histogram(df: DataFrame, column: str,
                          categories: list[str]) -> DataFrame:
    """Frequency histogram of a CATEGORICAL (string) column as ``(bucket,
    count)`` rows: bucket = index of the value in the sorted declared
    category list, with every UNDECLARED category collapsing to bucket
    -1 ("other") — so a brand-new category registers as drift mass
    rather than silently vanishing. NULLs are excluded (x-nullRate
    territory). Same one-shuffle #buckets-row shape as the numeric
    histogram; the sorted-list mapping is a literal array expression
    (no join, no UDF) and replays as a CASE ladder in the oracle."""
    cats = sorted(str(c) for c in categories)
    mapping = F.array(*[F.lit(c) for c in cats])
    b = F.array_position(mapping, F.col(column).cast("string"))
    return (
        df.where(F.col(column).isNotNull())
        .groupBy((b - 1).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def joint_cell_parts(dims: list[dict], default_column: str | None = None):
    """``(label_expr, not_null_pred, columns)`` for a JOINT cell over
    ``dims``: each dim is ``{"column"?, "bucketWidth"?}`` — numeric dims
    (``bucketWidth`` present) bucket as ``floor(col / width)``, categorical
    dims use the raw string value; the cell label is the ``'|'``-joined dim
    labels. Only the FIRST dim may omit ``column`` (it inherits the property
    the keyword is attached to). Rows where ANY dim is NULL are excluded —
    ``concat_ws`` would silently skip the null part and alias the row into
    a lower-arity cell, so the guard is explicit."""
    labels, preds, cols = [], [], []
    for i, spec in enumerate(dims):
        cname = spec.get("column") or (default_column if i == 0 else None)
        if not cname:
            raise ValueError(
                f"x-drift joint dim {i}: 'column' required (only the first "
                "dim inherits the attached property)")
        c = F.col(cname)
        if "bucketWidth" in spec:
            w = float(spec["bucketWidth"])
            labels.append(F.floor(c.cast("double") / F.lit(w))
                          .cast("long").cast("string"))
        else:
            labels.append(c.cast("string"))
        preds.append(c.isNotNull())
        cols.append(cname)
    nn = preds[0]
    for p in preds[1:]:
        nn = nn & p
    return F.concat_ws("|", *labels), nn, cols


def joint_histogram(df: DataFrame, dims: list[dict], declared: list[str],
                    default_column: str | None = None) -> DataFrame:
    """JOINT (multi-column) cell histogram as ``(bucket, count)``: bucket =
    index of the composite cell label in the sorted DECLARED cell list
    (the baseline's keys), undeclared cells collapsing to -1 ("other") —
    the 2-D lift of :func:`categorical_histogram`, catching mix shifts
    between columns (e.g. length×source) that every marginal histogram is
    blind to. Same one-shuffle #cells-row plan: the composite label and the
    sorted-list mapping are literal Catalyst expressions (no join, no UDF)
    and replay as CONCAT + CASE in the oracle."""
    label, nn, _ = joint_cell_parts(dims, default_column)
    cats = sorted(str(c) for c in declared)
    mapping = F.array(*[F.lit(c) for c in cats])
    b = F.array_position(mapping, label)
    return (
        df.where(nn)
        .groupBy((b - 1).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _normalized_join(observed_hist: DataFrame, baseline: dict[int, int],
                     spark) -> DataFrame:
    # union + re-aggregate instead of a full_outer join: Spark REJECTS a
    # broadcast hint on the build side of full_outer (falls back with a
    # HintErrorLogger warning), and an unhinted join of two tiny frames can
    # still plan a SortMergeJoin. The union shape needs no join at all —
    # one #buckets-row shuffle with map-side combine, deliberate at any scale.
    base_rows = [(int(b), int(c)) for b, c in baseline.items()]
    base_df = spark.createDataFrame(base_rows, "bucket long, base_count long")
    obs = observed_hist.select(
        "bucket", F.col("count").cast("long").alias("obs"),
        F.lit(0).cast("long").alias("base"))
    base = base_df.select(
        "bucket", F.lit(0).cast("long").alias("obs"),
        F.col("base_count").alias("base"))
    joined = (obs.unionByName(base).groupBy("bucket")
              .agg(F.sum("obs").alias("obs"), F.sum("base").alias("base")))
    totals = joined.select(F.sum("obs").alias("to"), F.sum("base").alias("tb"))
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (F.col("obs") / F.col("to")).alias("p_obs"),
        (F.col("base") / F.col("tb")).alias("p_base"),
    )


def psi_value_df(observed_hist: DataFrame, baseline: dict[int, int], spark) -> DataFrame:
    """Population Stability Index: Σ (p_obs − p_base) · ln(p_obs / p_base),
    ε-smoothed. Pure Column math over #buckets rows. Returns a 1-row DF
    ``(value double)`` so the whole drift check stays lazy."""
    n = _normalized_join(observed_hist, baseline, spark)
    return n.select(
        F.coalesce(
            F.sum(
                (F.col("p_obs") - F.col("p_base"))
                * F.log((F.col("p_obs") + EPS) / (F.col("p_base") + EPS))
            ),
            F.lit(0.0),
        ).alias("value")
    )


def ks_value_df(observed_hist: DataFrame, baseline: dict[int, int], spark) -> DataFrame:
    """Binned-ECDF Kolmogorov–Smirnov statistic: max |CDF_obs − CDF_base|
    over bucket boundaries. Window over #buckets rows (driver-scale)."""
    n = _normalized_join(observed_hist, baseline, spark)
    # partitionBy(lit(0)): same single partition (#buckets rows — already
    # driver-scale by construction), but EXPLICIT, so the WindowExec
    # "No Partition Defined" warning stays reserved for real hazards
    w = (Window.partitionBy(F.lit(0)).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        n.select(
            F.abs(F.sum("p_obs").over(w) - F.sum("p_base").over(w)).alias("d")
        )
        .agg(F.coalesce(F.max("d"), F.lit(0.0)).alias("value"))
    )


def chi2_value_df(observed_hist: DataFrame, baseline: dict[int, int],
                  spark) -> DataFrame:
    """Pearson chi-square statistic over the normalized histograms:
    Σ (p_obs − p_base)² / (p_base + ε) — the third drift statistic next to
    PSI (symmetric-ish, log-scaled) and KS (worst-case CDF gap): chi-square
    over-weights RELATIVE distortions of thin tails, which PSI's log damps
    and KS's max ignores when the mass shift is spread across buckets.
    Same #buckets-row plan as PSI."""
    n = _normalized_join(observed_hist, baseline, spark)
    return n.select(
        F.coalesce(
            F.sum(
                (F.col("p_obs") - F.col("p_base"))
                * (F.col("p_obs") - F.col("p_base"))
                / (F.col("p_base") + EPS)
            ),
            F.lit(0.0),
        ).alias("value")
    )


def kl_value_df(observed_hist: DataFrame, baseline: dict[int, int],
                spark) -> DataFrame:
    """Kullback–Leibler divergence D(obs ‖ base) = Σ p_obs · ln((p_obs+ε) /
    (p_base+ε)) — the fifth drift statistic: the expected log-likelihood
    penalty of MODELING the observed data with the baseline distribution,
    i.e. drift measured in nats of surprise. Unlike PSI (which symmetrizes
    by adding the reverse term) KL is directional — mass appearing in
    buckets the baseline considers near-impossible dominates, while mass
    VANISHING from baseline-heavy buckets is damped — exactly the
    asymmetry you want when the baseline is the trusted side. Empty
    observed buckets contribute 0 (0·ln ε = 0 under the ε-smoothing).
    Same #buckets-row plan as PSI."""
    n = _normalized_join(observed_hist, baseline, spark)
    return n.select(
        F.coalesce(
            F.sum(
                F.col("p_obs")
                * F.log((F.col("p_obs") + EPS) / (F.col("p_base") + EPS))
            ),
            F.lit(0.0),
        ).alias("value")
    )


def jsd_value_df(observed_hist: DataFrame, baseline: dict[int, int],
                 spark) -> DataFrame:
    """Jensen–Shannon divergence: ½·KL(obs ‖ m) + ½·KL(base ‖ m) with
    m = (p_obs + p_base)/2 — the sixth drift statistic: a SYMMETRIC,
    BOUNDED divergence (≤ ln 2 ≈ 0.693), finite even on disjoint
    supports, so thresholds transfer across columns and corpora where
    KL/PSI explode on novel buckets. The natural default for comparing
    two equally-trusted snapshots (profile A vs profile B) rather than
    observed-vs-trusted-baseline. Same #buckets-row plan as PSI."""
    n = _normalized_join(observed_hist, baseline, spark)
    m = (F.col("p_obs") + F.col("p_base")) / F.lit(2.0)
    term = (
        F.lit(0.5) * F.col("p_obs")
        * F.log((F.col("p_obs") + EPS) / (m + EPS))
        + F.lit(0.5) * F.col("p_base")
        * F.log((F.col("p_base") + EPS) / (m + EPS))
    )
    return n.select(F.coalesce(F.sum(term), F.lit(0.0)).alias("value"))


def emd_value_df(observed_hist: DataFrame, baseline: dict[int, int],
                 spark, bucket_width: float = 1.0) -> DataFrame:
    """Binned Wasserstein-1 (Earth Mover's) distance — the fourth drift
    statistic: ∫|CDF_obs − CDF_base| dx over the bucketed domain. It
    measures HOW FAR mass moved (in the column's units), which PSI/chi2
    (per-bucket, location-blind) and KS (worst single gap) all miss: a
    whole-distribution shift by 10 buckets and by 1 bucket give the same
    KS=1 but 10× different EMD.

    Computed as Σ_b |cumΔ(b)| · gap(b) · bucket_width where gap(b) is the
    distance to the NEXT occupied bucket — the cumulative difference
    persists across empty buckets, so the gap factor integrates the
    piecewise-constant CDF gap exactly (a plain per-row sum would
    undercount sparse histograms). Same #buckets-row plan as KS."""
    n = _normalized_join(observed_hist, baseline, spark)
    # explicit single partition over #buckets rows (see ks_value_df)
    cum = (Window.partitionBy(F.lit(0)).orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, 0))
    nxt = F.lead("bucket").over(
        Window.partitionBy(F.lit(0)).orderBy("bucket"))
    return (
        n.select(
            F.abs(F.sum(F.col("p_obs") - F.col("p_base")).over(cum))
            .alias("cd"),
            (F.coalesce(nxt, F.col("bucket")) - F.col("bucket"))
            .cast("double").alias("gap"),
        )
        .agg(F.coalesce(F.sum(F.col("cd") * F.col("gap")
                              * F.lit(float(bucket_width))),
                        F.lit(0.0)).alias("value"))
    )


def psi(observed_hist: DataFrame, baseline: dict[int, int], spark) -> float:
    return float(psi_value_df(observed_hist, baseline, spark).first()["value"])


def ks(observed_hist: DataFrame, baseline: dict[int, int], spark) -> float:
    return float(ks_value_df(observed_hist, baseline, spark).first()["value"])


def _stat_verdict_dfs(hist: DataFrame, baseline: dict[int, int],
                      check_id: str, params: dict, spark,
                      width: float = 1.0,
                      stats: tuple = ("psiMax", "ksMax", "chi2Max",
                                      "emdMax", "klMax", "jsdMax")
                      ) -> list[DataFrame]:
    """Shared statistic loop: one verdict DF per enabled threshold over a
    (bucket, count) histogram vs the baseline dict."""
    fns = {"psiMax": psi_value_df, "ksMax": ks_value_df,
           "chi2Max": chi2_value_df,
           "klMax": kl_value_df, "jsdMax": jsd_value_df,
           "emdMax": lambda h, b, sp: emd_value_df(
               h, b, sp, bucket_width=width)}
    names = {"psiMax": "psi", "ksMax": "ks", "chi2Max": "chi2",
             "emdMax": "emd", "klMax": "kl", "jsdMax": "jsd"}
    # r6: when more than one statistic is enabled, lazily checkpoint the
    # (bucket, count) histogram — every per-stat verdict DF embeds the
    # hist subtree, so N declared thresholds used to re-run the base-table
    # scan + groupBy N times when the verdicts union was actioned (the
    # anonymity union-rescans disease). #buckets rows — bounded.
    if sum(1 for name in stats if name in params) > 1:
        hist = hist.localCheckpoint(eager=False)
    out = []
    for name in stats:
        if name in params:
            tau = float(params[name])
            out.append(
                fns[name](hist, baseline, spark).select(
                    F.lit("<global>").alias("partition_id"),
                    F.lit(f"{check_id}/{names[name]}").alias("check_id"),
                    (F.col("value") <= tau).alias("passed"),
                    F.col("value").cast("double").alias("metric_value"),
                    F.lit(tau).cast("double").alias("threshold"),
                )
            )
    return out


def drift_verdict_dfs(df: DataFrame, column: str, check_id: str, params: dict,
                      spark) -> list[DataFrame]:
    """Lazy verdict DFs ``(partition_id, check_id, passed, metric_value,
    threshold)``. Numeric mode (default): fixed-bin histogram of the
    column, any of psiMax/ksMax/chi2Max/emdMax/klMax/jsdMax. Embedding mode
    (``params["cells"]`` present): the column is an embedding array and
    the histogram is over COARSE-CENTROID cell assignments
    (:func:`embedding_cell_histogram`) — semantic drift detection, the
    same cells as SemDeDup/IVF. Only PSI/chi2 apply there: cell ids have
    no metric order, so CDF-based KS/EMD are meaningless (rejected)."""
    if "joint" in params:
        # joint mode: baseline keyed by COMPOSITE CELL LABEL ("48|news");
        # cells are indices into the sorted declared labels, undeclared
        # cells collapse to -1 ("other"). Unordered → PSI/chi2/KL/JSD only.
        bad = [k for k in ("ksMax", "emdMax") if k in params]
        if bad:
            raise ValueError(
                f"{check_id}: {bad} not valid for joint drift — composite "
                "cells are unordered (use psiMax/chi2Max/klMax/jsdMax)")
        cells_sorted = sorted(str(k) for k in params["baseline"])
        baseline = {i: int(params["baseline"][c])
                    for i, c in enumerate(cells_sorted)}
        hist = joint_histogram(df, params["joint"], cells_sorted,
                               default_column=column)
        return _stat_verdict_dfs(hist, baseline, check_id, params, spark,
                                 stats=("psiMax", "chi2Max", "klMax",
                                        "jsdMax"))
    if params.get("categorical"):
        # categorical mode: baseline keyed by CATEGORY STRING; buckets
        # are indices into the sorted declared categories, undeclared
        # values collapse to -1 ("other"). Unordered → PSI/chi2 only.
        bad = [k for k in ("ksMax", "emdMax") if k in params]
        if bad:
            raise ValueError(
                f"{check_id}: {bad} not valid for categorical drift — "
                "categories are unordered (use psiMax/chi2Max/klMax/jsdMax)")
        cats = sorted(str(k) for k in params["baseline"])
        baseline = {i: int(params["baseline"][c])
                    for i, c in enumerate(cats)}
        hist = categorical_histogram(df, column, cats)
        return _stat_verdict_dfs(hist, baseline, check_id, params, spark,
                                 stats=("psiMax", "chi2Max", "klMax",
                                        "jsdMax"))
    if "edges" in params:
        # equi-depth mode: buckets bounded by the baseline's own quantile
        # edges. Ordered → KS is valid; EMD is not (bucket widths are
        # irregular, so index distance is not value distance).
        if "emdMax" in params:
            raise ValueError(
                f"{check_id}: emdMax not valid for quantile-edged drift — "
                "bucket widths are irregular (use psiMax/ksMax/chi2Max/"
                "klMax/jsdMax)")
        baseline = {int(k): int(v) for k, v in params["baseline"].items()}
        hist = quantile_histogram(df, column, params["edges"])
        return _stat_verdict_dfs(hist, baseline, check_id, params, spark,
                                 stats=("psiMax", "ksMax", "chi2Max",
                                        "klMax", "jsdMax"))
    if "cells" in params:
        baseline = {int(k): int(v) for k, v in params["baseline"].items()}
        bad = [k for k in ("ksMax", "emdMax") if k in params]
        if bad:
            raise ValueError(
                f"{check_id}: {bad} not valid for embedding-cell drift — "
                "cell ids are unordered (use psiMax/chi2Max/klMax/jsdMax)")
        cells = params["cells"]
        hist = embedding_cell_histogram(
            df, column, centroids=cells.get("centroids"),
            dim=cells.get("dim"), n_cells=int(cells.get("nCells", 16)),
            seed=int(cells.get("seed", 11)))
        return _stat_verdict_dfs(hist, baseline, check_id, params, spark,
                                 stats=("psiMax", "chi2Max", "klMax",
                                        "jsdMax"))
    width = float(params.get("bucketWidth", 1.0))
    baseline = {int(k): int(v) for k, v in params["baseline"].items()}
    hist = histogram(df, column, width)
    return _stat_verdict_dfs(hist, baseline, check_id, params, spark,
                             width=width)


def embedding_cell_histogram(df: DataFrame, vec_col: str,
                             centroids: list | None = None,
                             dim: int | None = None, n_cells: int = 16,
                             seed: int = 11) -> DataFrame:
    """(bucket, count) histogram of hard coarse-centroid assignments —
    the embedding-space analog of :func:`histogram`: one pure projection
    (centroids are plan literals) + one #cells-row aggregate. Feeds the
    PSI/chi2 statistics for SEMANTIC drift: a topic/domain shift moves
    mass between cells even when every scalar column looks stationary.
    Pass ``train_ivf_centroids`` output for production cells; the seeded
    default keeps the check fully deterministic (and oracle-replayable).
    The SAME centroids must be used for the baseline and observed sides."""
    from jsonschema_valid_spark.functions.similarity import (
        _nearest_cell1,
        _require_dim,
        ivf_centroids,
    )

    if centroids is None:
        dim = _require_dim(df, vec_col, dim)
        centroids = ivf_centroids(dim, n_cells, seed)
    v = F.col(vec_col).cast("array<double>")
    return (df.where(v.isNotNull())
            .groupBy(_nearest_cell1(v, centroids).cast("long")
                     .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("count")))


def drift_verdicts_per_partition(df: DataFrame, column: str, check_id: str,
                                 params: dict, pk: "F.Column"
                                 ) -> DataFrame:
    """Per-PARTITION drift verdicts (numeric mode) — the north-star's
    "per-partition pass/fail" granularity for x-drift
    (``{"perPartition": true}``): each partition group's histogram is
    tested against the SAME baseline, so a drifted source is named
    instead of diluted into the global mixture.

    Plan: ONE groupBy(partition, bucket).count() (map-side combine) →
    collect_list of the ≤#buckets entries per partition → all four
    statistics as native array-HOF math per row (the same expressions as
    streaming/checks.py stream_windowed_drift, which this mirrors —
    #buckets is a compile-time constant, so the O(#buckets²) KS prefix
    re-aggregation is per-row constant work). The baseline rides as a
    literal map; nothing shuffles but (partition, bucket) counts."""
    eps = EPS
    width = float(params.get("bucketWidth", 1.0))
    where_pred = F.col(column).isNotNull()
    if "joint" in params:
        # joint mode per partition: composite cells → declared-label
        # indices (undeclared → -1), then the identical map/HOF machinery
        # below — cells are unordered so CDF statistics are rejected
        bad = [k for k in ("ksMax", "emdMax") if k in params]
        if bad:
            raise ValueError(
                f"{check_id}: {bad} not valid for joint drift — composite "
                "cells are unordered (use psiMax/chi2Max/klMax/jsdMax)")
        cells_sorted = sorted(str(k) for k in params["baseline"])
        baseline = {i: int(params["baseline"][c])
                    for i, c in enumerate(cells_sorted)}
    else:
        baseline = {int(k): int(v) for k, v in params["baseline"].items()}
    btotal = float(sum(baseline.values())) or 1.0
    bmap = F.create_map(*[F.lit(v).cast("long")
                          for kv in sorted(baseline.items())
                          for v in (int(kv[0]), int(kv[1]))])
    bbuckets = F.array(*[F.lit(int(b)).cast("long") for b in sorted(baseline)])

    if "joint" in params:
        label, where_pred, _ = joint_cell_parts(params["joint"], column)
        mapping = F.array(*[F.lit(c) for c in sorted(
            str(k) for k in params["baseline"])])
        bucket_expr = (F.array_position(mapping, label) - 1).cast("long")
    elif "edges" in params:
        # equi-depth mode shares the per-partition machinery: only the
        # bucket expression differs (same rule as quantile_histogram)
        es = [float(e) for e in params["edges"]]
        earr = F.array(*[F.lit(e) for e in es])
        vcol = F.col(column).cast("double")
        bucket_expr = F.size(F.filter(earr, lambda e: vcol >= e)) \
            .cast("long")
    else:
        bucket_expr = F.floor(F.col(column) / F.lit(width)).cast("long")
    hist = (df.where(where_pred)
            .groupBy(pk.alias("partition_id"),
                     bucket_expr.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    per_p = (hist.groupBy("partition_id")
             .agg(F.collect_list(F.struct("bucket", "cnt")).alias("h")))

    obs_total = F.aggregate(
        "h", F.lit(0).cast("long"), lambda a, e: a + e["cnt"]).cast("double")
    obs_buckets = F.transform("h", lambda e: e["bucket"])
    obs_map = F.map_from_entries(
        F.transform("h", lambda e: F.struct(e["bucket"].alias("key"),
                                            e["cnt"].alias("value"))))
    stage = per_p.select(
        "partition_id",
        obs_total.alias("__ot"), obs_map.alias("__om"),
        F.array_sort(F.array_union(obs_buckets, bbuckets)).alias("__ub"))

    def p_obs(b):
        return (F.coalesce(F.try_element_at(F.col("__om"), b), F.lit(0))
                .cast("double") / F.col("__ot"))

    def p_base(b):
        return (F.coalesce(F.try_element_at(bmap, b), F.lit(0))
                .cast("double") / F.lit(btotal))

    psi_val = F.aggregate(
        F.col("__ub"), F.lit(0.0),
        lambda a, b: a + (p_obs(b) - p_base(b))
        * F.log((p_obs(b) + F.lit(eps)) / (p_base(b) + F.lit(eps))))
    chi2_val = F.aggregate(
        F.col("__ub"), F.lit(0.0),
        lambda a, b: a + (p_obs(b) - p_base(b)) * (p_obs(b) - p_base(b))
        / (p_base(b) + F.lit(eps)))
    cum_gaps = F.transform(
        F.col("__ub"),
        lambda b, i: F.abs(F.aggregate(
            F.slice(F.col("__ub"), F.lit(1), i + 1), F.lit(0.0),
            lambda a, x: a + (p_obs(x) - p_base(x)))))
    ks_val = F.coalesce(F.array_max(cum_gaps), F.lit(0.0))
    emd_terms = F.transform(
        F.col("__ub"),
        lambda b, i: F.abs(F.aggregate(
            F.slice(F.col("__ub"), F.lit(1), i + 1), F.lit(0.0),
            lambda a, x: a + (p_obs(x) - p_base(x))))
        * (F.coalesce(F.try_element_at(F.col("__ub"), (i + 2).cast("int")),
                      b) - b).cast("double")
        * F.lit(width))
    emd_val = F.coalesce(
        F.aggregate(emd_terms, F.lit(0.0), lambda a, t: a + t), F.lit(0.0))
    kl_val = F.aggregate(
        F.col("__ub"), F.lit(0.0),
        lambda a, b: a + p_obs(b)
        * F.log((p_obs(b) + F.lit(eps)) / (p_base(b) + F.lit(eps))))
    jsd_val = F.aggregate(
        F.col("__ub"), F.lit(0.0),
        lambda a, b: a
        + F.lit(0.5) * p_obs(b)
        * F.log((p_obs(b) + F.lit(eps))
                / ((p_obs(b) + p_base(b)) / F.lit(2.0) + F.lit(eps)))
        + F.lit(0.5) * p_base(b)
        * F.log((p_base(b) + F.lit(eps))
                / ((p_obs(b) + p_base(b)) / F.lit(2.0) + F.lit(eps))))

    vals = {"psiMax": ("psi", psi_val), "ksMax": ("ks", ks_val),
            "chi2Max": ("chi2", chi2_val), "emdMax": ("emd", emd_val),
            "klMax": ("kl", kl_val), "jsdMax": ("jsd", jsd_val)}
    verdicts = []
    for name, (stat, val) in vals.items():
        if name in params:
            tau = float(params[name])
            verdicts.append(F.struct(
                F.lit(f"{check_id}/{stat}").alias("check_id"),
                (val <= F.lit(tau)).alias("passed"),
                val.cast("double").alias("metric_value"),
                F.lit(tau).cast("double").alias("threshold")))
    return (stage.select(F.col("partition_id").cast("string")
                         .alias("partition_id"),
                         F.explode(F.array(*verdicts)).alias("v"))
            .select("partition_id", "v.*"))


def update_drift_baseline(node: dict, df: DataFrame, column: str,
                          decay: float = 0.5) -> dict:
    """Baseline MAINTENANCE: blend a pinned ``x-drift`` node with a newly
    TRUSTED snapshot — exponential decay in count space (``old*decay +
    new``), so the baseline tracks slow legitimate evolution (content
    mix shifts over months) without a human re-profiling, while a sudden
    break still trips the thresholds against the mostly-historical mass.
    ``decay=0`` replaces the baseline outright; ``decay=1`` accumulates
    forever (every epoch weighs equally).

    Only update from snapshots that PASSED the current node — updating
    from a drifted load launders the drift into the baseline. Bucketing
    follows the node's own mode (``edges`` pinned as-is, else
    ``bucketWidth``); categorical/cell nodes keep their key space.
    One histogram aggregate; #buckets rows reach the driver."""
    if not (0.0 <= float(decay) <= 1.0):
        raise ValueError(f"decay must be in [0, 1], got {decay}")
    if "cells" in node:
        raise ValueError("embedding-cell baselines update via re-running "
                         "embedding_cell_histogram with the SAME "
                         "centroids — pass that histogram directly")
    if node.get("categorical"):
        cats = sorted(str(k) for k in node["baseline"])
        hist = categorical_histogram(df, column, cats)
        idx_to_cat = {i: c for i, c in enumerate(cats)}
        new = {idx_to_cat.get(int(r["bucket"])): int(r["count"])
               for r in hist.collect() if int(r["bucket"]) >= 0}
        merged = {c: int(round(int(node["baseline"].get(c, 0))
                               * float(decay))) + int(new.get(c, 0))
                  for c in set(node["baseline"]) | set(new)}
    else:
        if "edges" in node:
            hist = quantile_histogram(df, column, node["edges"])
        else:
            hist = histogram(df, column,
                             float(node.get("bucketWidth", 1.0)))
        new = {int(r["bucket"]): int(r["count"]) for r in hist.collect()}
        old = {int(k): int(v) for k, v in node["baseline"].items()}
        merged = {b: int(round(old.get(b, 0) * float(decay)))
                  + int(new.get(b, 0))
                  for b in set(old) | set(new)}
    out = dict(node)
    out["baseline"] = {k: v for k, v in merged.items() if v > 0}
    return out
