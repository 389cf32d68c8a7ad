"""k-anonymity / l-diversity — privacy-release validation
(``x-kAnonymity``).

k-anonymity (Sweeney 2002): every combination of QUASI-IDENTIFIER values
(zip + age-band + gender, or nation + market segment) must be shared by
at least ``k`` rows — otherwise a released row is re-identifiable by
joining the quasi columns against an external dataset. l-diversity
(Machanavajjhala et al. 2007): within each quasi group the SENSITIVE
attribute must additionally take at least ``l`` distinct values — a group
can be k-anonymous and still leak (homogeneity attack: all k members
share the same diagnosis). This is the privacy member of the engine's
cardinality family: ``x-rowCount`` bounds how much a group has,
``x-distinctRatio`` the id rate; this bounds how LITTLE a group may have
before its rows cannot be released at all.

Scale shape: ONE map-side-combined groupBy over the quasi columns
carrying a count (plus one ``count_distinct(sensitive)`` — an Expand
pass — only when ``l`` is declared); violations are bounded by the
number of quasi CELLS, never row count; no join, no window. NULL quasi
values form their own group (a NULL zip is still a publishable,
joinable value); NULL sensitive values are NOT diversity (count_distinct
ignores them — an all-NULL group has diversity 0 and fails any l ≥ 1).

No reference analog (the reference validates single documents,
``validators.rs``); the lift target is the release-gate semantics of the
two papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cell_label(quasi: list[str]):
    """The canonical quasi-cell rendering: slash-joined with NULL spelled
    out (``concat_ws`` alone silently drops NULLs and two different
    cells could collide). ONE definition — batch doc_ids and streaming
    cell labels must stay comparable (parity tests ride it)."""
    return F.concat_ws(
        "/", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
               for c in quasi])


def anonymity_violations(
    df: DataFrame,
    quasi: list[str],
    check_id: str,
    k: int | None = None,
    l: int | None = None,  # noqa: E741 — the paper's own name
    sensitive: str | None = None,
) -> DataFrame:
    """Violations DF ``(doc_id, check_id, observed, expected)`` — one row
    per quasi cell failing a declared floor (a cell failing BOTH floors
    emits two rows, one per rule). doc_id renders the cell slash-joined
    with NULL spelled out (``concat_ws`` would silently drop it and two
    different cells could collide)."""
    if not quasi:
        raise ValueError("x-kAnonymity needs at least one quasi column")
    missing = [c for c in quasi if c not in df.columns]
    if missing:
        raise ValueError(f"quasi columns missing from input: {missing}")
    if k is None and l is None:
        raise ValueError("x-kAnonymity needs k and/or l")
    if l is not None and not sensitive:
        raise ValueError("l-diversity needs the sensitive column")
    if sensitive is not None and sensitive not in df.columns:
        raise ValueError(f"sensitive column {sensitive!r} not in input")

    aggs = [F.count(F.lit(1)).alias("__n")]
    if l is not None:
        aggs.append(F.countDistinct(sensitive).alias("__d"))
    cells = df.groupBy(*[F.col(c) for c in quasi]).agg(*aggs)
    label = cell_label(quasi)

    # r6: ONE subtree, not a union of per-rule filters — the old
    # union(k-rows, l-rows) let per-branch column pruning specialize each
    # branch's aggregate (the k branch dropped the count_distinct), so
    # ReuseExchange never fired and the 10^12-row scan + groupBy ran once
    # PER DECLARED RULE (plan-verified: two parquet scans). A cell failing
    # both floors still emits two rows, one per rule, same as before.
    structs = []
    if k is not None:
        structs.append(F.when(F.col("__n") < int(k), F.struct(
            F.concat(F.lit("count="), F.col("__n").cast("string"))
            .alias("observed"),
            F.lit(f"group size >= {int(k)}").alias("expected"),
        )))
    if l is not None:
        structs.append(F.when(F.col("__d") < int(l), F.struct(
            F.concat(F.lit("distinct="), F.col("__d").cast("string"),
                     F.lit(" (count="), F.col("__n").cast("string"),
                     F.lit(")")).alias("observed"),
            F.lit(f"sensitive diversity >= {int(l)}").alias("expected"),
        )))
    return (cells
            .select(label.alias("doc_id"),
                    F.explode(F.array_compact(F.array(*structs))).alias("v"))
            .select("doc_id", F.lit(check_id).alias("check_id"),
                    "v.observed", "v.expected"))


def t_closeness_violations(
    df: DataFrame,
    quasi: list[str],
    sensitive: str,
    t: float,
    check_id: str,
    ordered: bool = False,
) -> DataFrame:
    """t-closeness (Li et al. 2007) — the third privacy floor: each
    quasi cell's SENSITIVE distribution must stay within distance ``t``
    of the table-global distribution. k-anonymity bounds cell size,
    l-diversity bounds cell diversity; both are blind to the SKEW
    attack — a large, diverse cell that is 90% one diagnosis against a
    10% global rate still tells the adversary most of what they came
    for.

    Distance: total variation ½·Σ|p−q| for categorical sensitives;
    ``ordered=True`` uses the paper's ordered-distance EMD
    (Σ|cumsum(p−q)| / (m−1) over the value order) for numeric
    sensitives, where mass moved two buckets counts twice.

    Cross-engine determinism: distances are built from INTEGER
    numerators — |n_cv·N − N_v·n_c| sums exactly in any order (the
    x-compliance integer-arithmetic convention; decimal(38) per the
    reconcile overflow rule at 10^12 rows) — finished by ONE IEEE
    division, so Spark and an oracle agree bit-for-bit.

    Scale shape: one groupBy over (quasi, sensitive) — everything after
    is algebra on #cells × #values rows (the global marginal is a
    window over that aggregate, never a second scan; no join). NULL
    sensitive rows are outside the distribution (l-diversity's rule);
    NULL quasi values form their own cell.
    """
    if not quasi:
        raise ValueError("t-closeness needs at least one quasi column")
    if not sensitive:
        raise ValueError("t-closeness needs the sensitive column")
    if not (0 < float(t) <= 1):
        raise ValueError(f"t must be in (0, 1], got {t}")
    if sensitive in quasi:
        # a column's distribution within cells keyed by itself is a
        # point mass by construction — the distance is vacuous (and the
        # EMD grid join would be ambiguous); a real check names two
        # different columns
        raise ValueError(
            f"sensitive column {sensitive!r} cannot be a quasi identifier")
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    # r6: localCheckpoint (lazy) the (quasi, sensitive) aggregate — it is
    # the root of THREE branches (per-value marginal, global total, the
    # windowed cell counts) and per-branch optimization used to specialize
    # each subtree past ReuseExchange, re-running the 10^12-row scan +
    # groupBy once per branch (plan-verified: three parquet scans). The
    # aggregate is #cells × #values rows — the operator's own documented
    # bounded regime — so pinning it is the drift-histogram class of
    # materialization, not a data-scale cache.
    cv = (df.where(F.col(sensitive).isNotNull())
          .groupBy(*[F.col(c) for c in quasi], F.col(sensitive))
          .agg(F.count(F.lit(1)).cast(dec).alias("__ncv"))
          .localCheckpoint(eager=False))
    # marginals: per-value (Nv, N) is a #values-row table. The global
    # total is a broadcast scalar cross-joined on (the x-maxFrequency
    # convention since r5) — a single-frame window here would funnel
    # every distinct SENSITIVE value through one task, unbounded for
    # numeric sensitives. ReuseExchange makes the scalar branch read
    # the same shuffle, not re-scan. Never computed over the
    # #cells×#values aggregate; the per-cell total is a window
    # partitioned by the cell.
    vals = cv.groupBy(sensitive).agg(F.sum("__ncv").alias("__Nv"))
    vals = vals.crossJoin(
        F.broadcast(vals.agg(F.sum("__Nv").alias("__N"))))
    w_cell = Window.partitionBy(*quasi)
    cv = (cv.withColumn("__nc", F.sum("__ncv").over(w_cell))
          .join(F.broadcast(vals), sensitive))
    # integer numerator of p_cell − p_global, common denominator nc·N —
    # exact in any summation order (decimal(38) per the reconcile
    # overflow rule at 10^12 rows), ONE IEEE division at the end.
    diff = F.col("__ncv") * F.col("__N") - F.col("__Nv") * F.col("__nc")
    if ordered:
        # EMD over the sensitive value order: running cumsum of the
        # signed diff INCLUDING values absent from the cell (they shift
        # the cumsum too) — so complete each cell to the full value
        # domain first: (value marginal) × (cell marginal), both tiny,
        # left-joined back onto the observed counts.
        cells_nc = cv.groupBy(*quasi).agg(F.max("__nc").alias("__nc"))
        # null-SAFE join back onto the observed counts: a plain equi-join
        # never matches a NULL quasi cell, zeroing its real counts and
        # replacing its distance with a constant (the suppress_thin_cells
        # lesson — NULL cells are real, publishable cells)
        obs = cv.select(
            *[F.col(c).alias(f"__o_{c}") for c in quasi],
            F.col(sensitive).alias("__o_s"), "__ncv")
        jcond = F.col(sensitive) == F.col("__o_s")
        for c in quasi:
            jcond = jcond & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
        full = (vals.crossJoin(cells_nc)
                .join(obs, jcond, "left")
                .withColumn("__ncv", F.coalesce(F.col("__ncv"),
                                                F.lit(0).cast(dec)))
                .drop("__o_s", *[f"__o_{c}" for c in quasi]))
        sdiff = (F.col("__ncv") * F.col("__N")
                 - F.col("__Nv") * F.col("__nc"))
        full = full.withColumn(
            "__cum", F.sum(sdiff).over(w_cell.orderBy(sensitive)))
        cells = (full.groupBy(*quasi)
                 .agg(F.sum(F.abs(F.col("__cum"))).alias("__num"),
                      F.max("__nc").alias("__nc"),
                      F.max("__N").alias("__N"),
                      F.count(F.lit(1)).alias("__m")))
        # single-value domain: distance undefined (m=1 ⇒ cell == global)
        cells = cells.where(F.col("__m") > 1)
        dist = (F.col("__num").cast("double")
                / ((F.col("__m") - 1).cast("double")
                   * F.col("__nc").cast("double")
                   * F.col("__N").cast("double")))
    else:
        # a value ABSENT from a cell still contributes |0 − q_v| = Nv·nc:
        # Σ_all |…| = Σ_present (|…| − Nv·nc) + N·nc  (since Σ_all Nv = N)
        cells = (cv.groupBy(*quasi)
                 .agg(F.sum(F.abs(diff) - F.col("__Nv") * F.col("__nc"))
                      .alias("__part"),
                      F.max("__nc").alias("__nc"),
                      F.max("__N").alias("__N")))
        num = F.col("__part") + F.col("__N") * F.col("__nc")
        dist = (num.cast("double")
                / (2.0 * F.col("__nc").cast("double")
                   * F.col("__N").cast("double")))
    label = cell_label(quasi)
    kind = "emd" if ordered else "tvd"
    return (cells.withColumn("__dist", dist)
            .where(F.col("__dist") > float(t))
            .select(
                label.alias("doc_id"),
                F.lit(check_id).alias("check_id"),
                # 6dp decimal witness (the x-trend convention: fixed-point
                # rendering is identical across engines; bare double
                # strings flip to scientific notation differently)
                F.concat(F.lit(f"{kind}="),
                         F.round(F.col("__dist"), 6)
                         .cast("decimal(10,6)").cast("string"))
                .alias("observed"),
                F.lit(f"sensitive distribution within {kind} {t} of global")
                .alias("expected"),
            ))


def suppress_thin_cells(
    df: DataFrame,
    quasi: list[str],
    k: int | None = None,
    l: int | None = None,  # noqa: E741 — the paper's own name
    sensitive: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """``(released, suppressed)`` partition of ``df`` by the cell-level
    privacy floors — the dataset-scope sibling of ``engine.split_valid``
    (which partitions by ROW checks): rows whose quasi cell fails
    k-anonymity / l-diversity are routed to the suppressed side instead
    of shipping (suppression is the paper's baseline repair; a
    t-closeness repair needs GENERALIZATION — coarsening the quasi
    values — which changes the schema and is a modeling decision, not an
    engine split, so ``t`` is deliberately not accepted here).

    Scale shape: the failing-cell set (bounded by #cells) joins back
    against the fact scan — null-SAFE on every quasi column (a plain
    equi-join never matches NULL cells, which would silently RELEASE
    exactly the rows a NULL-zip cell was supposed to suppress). Spark
    broadcasts the cell side when small; both outputs are lazy views of
    one derivation.
    """
    if not quasi:
        raise ValueError("suppress_thin_cells needs at least one "
                         "quasi column")
    missing = [c for c in quasi if c not in df.columns]
    if missing:
        raise ValueError(f"quasi columns missing from input: {missing}")
    if k is None and l is None:
        raise ValueError("suppress_thin_cells needs k and/or l")
    if l is not None and not sensitive:
        raise ValueError("l-diversity needs the sensitive column")
    if sensitive is not None and sensitive not in df.columns:
        raise ValueError(f"sensitive column {sensitive!r} not in input")
    aggs = [F.count(F.lit(1)).alias("__n")]
    if l is not None:
        aggs.append(F.countDistinct(sensitive).alias("__d"))
    cells = df.groupBy(*[F.col(c) for c in quasi]).agg(*aggs)
    bad = F.lit(False)
    if k is not None:
        bad = bad | (F.col("__n") < int(k))
    if l is not None:
        bad = bad | (F.col("__d") < int(l))
    bad_cells = cells.where(bad).select(
        *[F.col(c).alias(f"__q_{c}") for c in quasi])
    cond = F.lit(True)
    for c in quasi:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__q_{c}"))
    released = df.join(bad_cells, cond, "left_anti")
    suppressed = df.join(bad_cells, cond, "left_semi")
    return released, suppressed
