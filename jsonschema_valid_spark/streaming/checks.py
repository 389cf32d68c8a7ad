"""Structured Streaming validation.

The reference has no streaming (SURVEY.md §2.4) — this is an engine-level
lift: the SAME compiled check suite runs over an unbounded stream.

* **row checks** → a violations STREAM: the identical fused projection
  (compiler row predicates) applied to a streaming DataFrame; stateless, so
  it runs in every output mode with no watermark.
* **aggregate checks** → WINDOWED verdicts: the fused multi-aggregate pass
  grouped by an event-time window + watermark for late data; emits one
  verdict row per (window, check) as windows close (append mode).
* **cross-row uniqueness** → ``dropDuplicatesWithinWatermark`` (state-store
  backed, state bounded by the watermark horizon) or duplicate ALERTS via a
  stateful count.

At deploy scale this is the validation-on-ingest path: readStream from
Kafka/files → violations stream to a quarantine sink, windowed verdicts to
a metrics sink, both from one compiled suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jsonschema_valid_spark.compiler import bind
from jsonschema_valid_spark.engine import row_violations


def stream_row_violations(suite, sdf: DataFrame, key: str = "doc_id") -> DataFrame:
    """Stateless violations stream — same fused single projection as batch
    (engine.row_violations works unchanged on a streaming DF)."""
    plan = bind(suite, sdf)
    return row_violations(sdf, plan, key)


def stream_windowed_verdicts(
    suite,
    sdf: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Fused multi-aggregate verdicts per event-time window.

    One ``groupBy(window(ts))`` carries every row-check fail counter and
    every aggregate check — identical fusion to the batch engine, with the
    partition key replaced by the time window. Late rows beyond the
    watermark are dropped by Spark's state store."""
    plan = bind(suite, sdf)
    wm = sdf.withWatermark(ts_col, watermark)

    agg_exprs = [F.count(F.lit(1)).alias("__rows")]
    rc_aliases = []
    for i, rc in enumerate(plan.row_checks):
        alias = f"__rc{i}"
        rc_aliases.append(alias)
        agg_exprs.append(
            F.sum((~F.coalesce(rc.pred, F.lit(True))).cast("long")).alias(alias))
    for ac in plan.agg_checks:
        for alias, expr in ac.aggs.items():
            agg_exprs.append(expr.alias(alias))

    agg = wm.groupBy(F.window(F.col(ts_col), window_duration)).agg(*agg_exprs)

    verdict_structs = []
    for rc, alias in zip(plan.row_checks, rc_aliases):
        verdict_structs.append(F.struct(
            F.lit(rc.check_id).alias("check_id"),
            (F.col(alias) == 0).alias("passed"),
            F.col(alias).cast("double").alias("metric_value"),
            F.lit(0.0).cast("double").alias("threshold"),
        ))
    for ac in plan.agg_checks:
        verdict_structs.append(F.struct(
            F.lit(ac.check_id).alias("check_id"),
            ac.passed().alias("passed"),
            ac.metric().cast("double").alias("metric_value"),
            F.lit(ac.threshold).cast("double").alias("threshold"),
        ))
    return (
        agg.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.explode(F.array(*verdict_structs)).alias("v"),
        )
        .select("window_start", "window_end", "v.*")
    )


def stream_dedup(sdf: DataFrame, key: str, ts_col: str,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming uniqueness enforcement: exactly-once keys within the
    watermark horizon (state-store hash set, bounded by the watermark)."""
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def stream_running_null_rate(sdf: DataFrame, group_col: str, value_col: str,
                             ts_col: str, threshold: float,
                             watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-group
    RUNNING null-rate across micro-batches (unlike the windowed verdicts,
    state carries the lifetime totals). Emits one row per (group, batch)
    with the cumulative rate and an alert flag.

    This is the applyInPandasWithState pattern for checks that windowed
    aggregation can't express (monotone lifetime counters); state is two
    longs per group — O(#groups) regardless of stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{group_col} string, rows long, nulls long, "
                  "null_rate double, alert boolean")
    state_schema = "rows long, nulls long"

    def update(key_tuple, pdfs, state: GroupState):
        rows, nulls = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            rows += len(pdf)
            nulls += int(pdf[value_col].isna().sum())
        state.update((rows, nulls))
        rate = (nulls / rows) if rows else 0.0
        yield pd.DataFrame({
            group_col: [key_tuple[0]], "rows": [rows], "nulls": [nulls],
            "null_rate": [rate], "alert": [rate > threshold],
        })

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(group_col)
        .applyInPandasWithState(
            update, outputStructType=out_schema, stateStructType=state_schema,
            outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_monotonic_violations(
    sdf: DataFrame,
    column: str,
    order_by: str,
    by: str,
    key: str,
    ts_col: str,
    direction: str = "nonDecreasing",
    watermark: str = "10 minutes",
    check_id: str | None = None,
) -> DataFrame:
    """Streaming ``x-monotonic`` (operators/ordering.py lifted to an
    unbounded stream): per-group monotonicity where the chain must survive
    MICRO-BATCH BOUNDARIES — state carries each group's last
    (order, value) so the first row of batch N is compared against the
    last row of batch N-1, which no stateless projection or windowed
    aggregate can do. This is the ``applyInPandasWithState`` pattern from
    BASELINE.json north_star ("custom stateful operators"); state is two
    doubles + a bool per group, O(#groups) regardless of stream length.

    Within a micro-batch rows are sorted by (``order_by``, ``key``) —
    identical to the batch operator's window order. ACROSS batches the
    comparison is in arrival order: a source that replays a group's rows
    out of order across batches is itself a sequencing violation this
    check is designed to surface (the batch operator re-sorts globally;
    parity with it holds when batches arrive in order — asserted in
    tests). NULL pairs never violate (same contract as batch: nulls are
    policed by type/required/x-nullRate; a NULL breaks the chain for one
    comparison). Numeric columns only: order/value ride the state store
    as doubles (timestamps: cast or pass the epoch value).

    Emits engine-shaped violation rows (doc_id, check_id, observed,
    expected) — routable to the same quarantine sink as
    :func:`stream_row_violations`.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    viol_ops = {
        "nonDecreasing": lambda p, c: c < p,
        "increasing": lambda p, c: c <= p,
        "nonIncreasing": lambda p, c: c > p,
        "decreasing": lambda p, c: c >= p,
    }
    if direction not in viol_ops:
        raise ValueError(
            f"direction must be one of {sorted(viol_ops)}, got {direction!r}")
    breaks = viol_ops[direction]
    cid = check_id or f"properties/{column}/x-monotonic"
    exp_msg = f"{column} {direction} over {order_by} per {by} (stream)"

    out_schema = ("doc_id string, check_id string, observed string, "
                  "expected string")
    state_schema = "last_ord double, last_val double, has_prev boolean"

    def _fmt(x) -> str:
        # integral doubles render like their int source ("20" not "20.0")
        # so observed matches the batch operator's CAST AS STRING on ints
        return "%g" % x

    def update(key_tuple, pdfs, state: GroupState):
        prev_ord, prev_val, has_prev = (
            state.get if state.exists else (0.0, 0.0, False))
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
            .sort_values(["__ord", "__key"], kind="mergesort")
        docs, obs = [], []
        prev = prev_val if has_prev else None
        for k, cur in zip(pdf["__key"].to_numpy(),
                          pdf["__val"].to_numpy()):
            cur = None if pd.isna(cur) else float(cur)
            if prev is not None and cur is not None and breaks(prev, cur):
                docs.append(str(k))
                obs.append(f"prev={_fmt(prev)},cur={_fmt(cur)}")
            prev = cur
        last = pdf.iloc[-1]
        state.update((
            0.0 if pd.isna(last["__ord"]) else float(last["__ord"]),
            0.0 if prev is None else prev,
            prev is not None,
        ))
        if docs:
            yield pd.DataFrame({
                "doc_id": docs,
                "check_id": cid,
                "observed": obs,
                "expected": exp_msg,
            })

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(by).alias("__by"),
            F.col(ts_col).alias(ts_col),
            F.col(order_by).cast("double").alias("__ord"),
            F.col(key).cast("string").alias("__key"),
            F.col(column).cast("double").alias("__val"),
        )
    )
    return prepped.groupBy("__by").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_level_shift_alerts(
    sdf: DataFrame,
    column: str,
    order_by: str,
    by: str,
    key: str,
    ts_col: str,
    window: int = 20,
    max_shift: float = 1.0,
    watermark: str = "10 minutes",
    check_id: str | None = None,
) -> DataFrame:
    """Streaming ``x-levelShift`` (operators/changepoint.py lifted to an
    unbounded stream): the jump of the LOCAL MEAN detected as it
    happens — state carries each group's trailing 2·window−1 values so
    the two adjacent rolling means survive micro-batch boundaries
    (a step that straddles a batch edge is exactly what a stateless
    per-batch recompute would miss).  State is a bounded double array
    per group: O(#groups · window), independent of stream length.

    Semantic difference from batch, by design: the batch operator
    reports each group's PEAK shift over the whole table (a rank over
    completed data); a stream cannot know the future peak, so this
    emits an alert at EVERY position whose shift exceeds ``max_shift``
    — the alert-stream form.  Parity contract (pytest): the set of
    (group, at) alerts equals the positions where the batch
    ``level_shifts`` series exceeds the bound, batches split anywhere.
    Positions where either window contains a NULL are silent (the batch
    ``count == n`` fullness rule).
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = int(window)
    if n < 2:
        raise ValueError("window must be >= 2")
    cid = check_id or f"properties/{column}/x-levelShift"
    exp_msg = (f"max |mean(last {n}) - mean(prior {n})| of {column} "
               f"<= {float(max_shift):g} per {by} (stream)")
    out_schema = ("doc_id string, check_id string, observed string, "
                  "expected string")
    state_schema = "vals array<double>"
    thr = float(max_shift)

    def update(key_tuple, pdfs, state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
            .sort_values(["__ord", "__key"], kind="mergesort")
        grp = str(key_tuple[0])
        docs, obs = [], []
        for ord_v, cur in zip(pdf["__ord"].to_numpy(),
                              pdf["__val"].to_numpy()):
            buf.append(float("nan") if pd.isna(cur) else float(cur))
            if len(buf) > 2 * n:
                buf.pop(0)
            if len(buf) == 2 * n:
                rec, pri = buf[n:], buf[:n]
                if not any(math.isnan(v) for v in buf):
                    shift = abs(sum(rec) / n - sum(pri) / n)
                    if shift > thr:
                        docs.append(grp)
                        obs.append("shift=%.4f,at=%s"
                                   % (shift, "%g" % ord_v))
        state.update((buf[-(2 * n - 1):],))
        if docs:
            yield pd.DataFrame({
                "doc_id": docs,
                "check_id": cid,
                "observed": obs,
                "expected": exp_msg,
            })

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(by).alias("__by"),
            F.col(ts_col).alias(ts_col),
            F.col(order_by).cast("double").alias("__ord"),
            F.col(key).cast("string").alias("__key"),
            F.col(column).cast("double").alias("__val"),
        )
    )
    return prepped.groupBy("__by").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_overlap_violations(
    sdf: DataFrame,
    column: str,
    end_column: str,
    by: str,
    key: str,
    ts_col: str,
    allow_touch: bool = True,
    watermark: str = "10 minutes",
    check_id: str | None = None,
) -> DataFrame:
    """Streaming ``x-noOverlap`` (operators/intervals.py lifted to an
    unbounded stream): per-group interval disjointness where the RUNNING
    MAX of prior ends must survive micro-batch boundaries — state carries
    each group's max end seen so far, so an interval arriving in batch N
    is checked against every interval of batches 1..N-1 in O(1) state
    (one double + bool per group), which no stateless projection can do.

    Within a micro-batch rows are sorted by (``column``, ``key``) —
    identical to the batch operator's window order — and compared to the
    running max of earlier ends, so containment chains are caught exactly
    like batch. ACROSS batches the state IS the running max, so batch
    parity holds whenever each group's intervals arrive start-ordered
    across batches (same arrival contract as stream_monotonic_violations,
    asserted in tests). Rows with a NULL start or end never violate and
    contribute nothing to the max (same contract as batch). Numeric
    endpoints only (timestamps: pass epoch seconds).

    Emits engine-shaped violation rows (doc_id, check_id, observed,
    expected).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cid = check_id or f"properties/{column}/x-noOverlap"
    cmp = "<" if allow_touch else "<="
    exp_msg = (f"[{column},{end_column}) disjoint per {by} (stream; "
               f"violation when {column} {cmp} max prior {end_column})")

    out_schema = ("doc_id string, check_id string, observed string, "
                  "expected string")
    state_schema = "max_end double, has_prev boolean"

    def _fmt(x) -> str:
        # integral doubles render like their int source ("20" not "20.0")
        return "%g" % x

    def update(key_tuple, pdfs, state: GroupState):
        max_end, has_prev = state.get if state.exists else (0.0, False)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
            .sort_values(["__start", "__key"], kind="mergesort")
        docs, obs = [], []
        cur_max = max_end if has_prev else None
        for k, s, e in zip(pdf["__key"].to_numpy(),
                           pdf["__start"].to_numpy(),
                           pdf["__end"].to_numpy()):
            s = None if pd.isna(s) else float(s)
            e = None if pd.isna(e) else float(e)
            if s is not None and e is not None:
                if cur_max is not None and (
                        s < cur_max if allow_touch else s <= cur_max):
                    docs.append(str(k))
                    obs.append(f"start={_fmt(s)},prev_end={_fmt(cur_max)}")
                cur_max = e if cur_max is None else max(cur_max, e)
        state.update((0.0 if cur_max is None else cur_max,
                      cur_max is not None))
        if docs:
            yield pd.DataFrame({
                "doc_id": docs,
                "check_id": cid,
                "observed": obs,
                "expected": exp_msg,
            })

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(by).alias("__by"),
            F.col(ts_col).alias(ts_col),
            F.col(key).cast("string").alias("__key"),
            F.col(column).cast("double").alias("__start"),
            F.col(end_column).cast("double").alias("__end"),
        )
    )
    return prepped.groupBy("__by").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_recent_duplicate_violations(
    sdf: DataFrame,
    column: str,
    key: str,
    ts_col: str,
    within_seconds: float,
    by: str | None = None,
    watermark: str = "10 minutes",
    check_id: str | None = None,
) -> DataFrame:
    """Streaming ``x-unique {"withinSeconds": W}`` (operators/
    uniqueness.py recent_duplicate_violations lifted to an unbounded
    stream): the same value may recur, but not within ``W`` seconds of
    its previous occurrence — replay / double-fire / rate-limit
    detection where the recurrence must survive MICRO-BATCH BOUNDARIES.
    State carries each value's last occurrence (epoch micros), so an
    event in batch N is checked against its predecessor from batch N−1
    — which native ``dropDuplicatesWithinWatermark`` cannot report (it
    silently KEEPS the first and drops the rest; a validation engine
    must NAME the violating rows instead).

    State is bounded two ways: one long per LIVE value, and an
    event-time timer evicts a value's entry once the watermark passes
    last_seen + W (it can no longer witness a violation) — so state
    tracks the values active inside one W-horizon, not the stream's
    history.  Within a micro-batch rows are ordered by (ts, key)
    exactly like the batch window; across batches arrival order is
    event-time order up to the watermark.  NULL values/timestamps drop
    out in the stateless prep (required/x-nullRate police those).

    Emits engine-shaped violation rows naming the LATER row, with the
    same ``value=...,gap_us=...`` witness as the batch operator
    (parity pytest-asserted).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    w_us = int(round(float(within_seconds) * 1_000_000))
    if w_us <= 0:
        raise ValueError("withinSeconds must be positive")
    w_ms = (w_us + 999) // 1000
    cid = check_id or f"properties/{column}/x-unique"
    scope = f" per {by}" if by else ""
    exp_msg = (f"{column} must not recur within {within_seconds:g}s"
               f"{scope} (stream)")

    out_schema = ("doc_id string, check_id string, observed string, "
                  "expected string")
    state_schema = "last_us long"

    def update(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed last_seen + W: this value can no longer
            # witness a violation — drop its entry
            state.remove()
            return
        prev = state.get[0] if state.exists else None
        chunks = [p for p in pdfs if len(p)]
        if not chunks and prev is None:
            return
        docs, vals, gaps = [], [], []
        if chunks:
            pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
                .sort_values(["__us", "__key"], kind="mergesort")
            for k, us in zip(pdf["__key"].to_numpy(),
                             pdf["__us"].to_numpy()):
                us = int(us)
                if prev is not None and us - prev <= w_us:
                    docs.append(str(k))
                    vals.append(str(key_tuple[0]))
                    gaps.append(str(us - prev))
                prev = us
        state.update((int(prev),))
        # a timer at-or-before the watermark is rejected; clamp to
        # watermark+1ms — the entry is already evictable and goes on
        # the next trigger instead of crashing the query
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(prev // 1000 + w_ms, wm + 1))
        if docs:
            yield pd.DataFrame({
                "doc_id": docs,
                "check_id": cid,
                "observed": ["value=%s,gap_us=%s" % (v, g)
                             for v, g in zip(vals, gaps)],
                "expected": exp_msg,
            })

    group = [F.col(column).cast("string").alias("__val")] + (
        [F.col(by).cast("string").alias("__by")] if by else [])
    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .where(F.col(column).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            *group,
            F.col(ts_col),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
            F.col(key).cast("string").alias("__key"),
        )
    )
    names = ["__val"] + (["__by"] if by else [])
    return prepped.groupBy(*names).applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_freshness_alerts(
    sdf: DataFrame,
    group_col: str,
    ts_col: str,
    max_age: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-freshness`` (operators/freshness.py lifted to an
    unbounded stream): alert when a group's events STOP ARRIVING — the
    batch keyword compares max(ts) against a declared as-of; on a stream
    the equivalent question is "has the watermark advanced past
    last_seen + max_age with no new rows", which only an EVENT-TIME TIMER
    can ask (no row exists to trigger on — staleness is the absence of
    rows, so stateless projections and windowed aggregates are blind to
    it). Uses ``GroupStateTimeout.EventTimeTimeout``: each batch re-arms
    the group's timer at max(ts) + max_age; when the watermark (advanced
    by OTHER groups' traffic) passes the timer with no new data, the
    group times out and one alert row is emitted, then state is dropped
    (a later arrival re-creates the group — and re-alerts if it stalls
    again). State per group: one timestamp — O(#groups) forever.

    Determinism contract: timers fire on watermark advance (event time),
    never the wall clock — replaying the same batched input produces the
    same alerts (pytest-asserted), keeping the engine's wall-clock-free
    promise in streaming.

    Emits (group, last_seen, status='stale') rows, routable to the same
    alert sink as the windowed verdicts.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    delta = F.expr(f"INTERVAL {max_age}")  # validate eagerly on the driver
    max_age_ms = sdf.sparkSession.range(1).select(
        (F.timestamp_millis(F.lit(0).cast("long")) + delta).cast("long")
    ).first()[0] * 1000
    out_schema = f"{group_col} string, last_seen timestamp, status string"
    state_schema = "last_seen_ms long"

    def update(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            (last_ms,) = state.get
            state.remove()
            yield pd.DataFrame({
                group_col: [key_tuple[0]],
                "last_seen": [pd.Timestamp(last_ms, unit="ms")],
                "status": ["stale"],
            })
            return
        last_ms = state.get[0] if state.exists else 0
        for pdf in pdfs:
            mx = pdf[ts_col].max()
            if not pd.isna(mx):
                last_ms = max(last_ms, int(mx.value // 1_000_000))
        state.update((last_ms,))
        # a timer at-or-before the watermark is rejected by Spark; clamp
        # to watermark+1ms — the group is ALREADY stale and fires next
        # trigger instead of crashing the query
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + max_age_ms, wm + 1))
        return

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(ts_col),
        )
    )
    return prepped.groupBy(group_col).applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_distribution_verdicts(
    sdf: DataFrame,
    column: str,
    ts_col: str,
    family: str,
    params: dict,
    bucket_width: float = 1.0,
    psi_max: float | None = None,
    ks_max: float | None = None,
    chi2_max: float | None = None,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming ``x-distribution``: per-window goodness-of-fit against a
    CLOSED-FORM law — the baseline-free twin of
    :func:`stream_windowed_drift`, sharing its entire execution (the
    law's per-bucket mass is integrated from the CDF on the driver by
    ``operators/distribution.py`` exactly as in batch, then rides the
    windowed-drift machinery as a literal baseline map). The
    validate-on-ingest form of the hash-gate-uniformity / Poisson-
    inter-arrival check: a sampler that breaks at 14:00 is named by the
    14:00 window, not diluted into the day's mixture."""
    from jsonschema_valid_spark.operators.distribution import (
        first_digit_expr,
        parametric_baseline,
    )

    if psi_max is None and ks_max is None and chi2_max is None:
        raise ValueError("stream_distribution_verdicts needs at least one "
                         "of psi_max/ks_max/chi2_max")
    baseline = parametric_baseline(family, params, float(bucket_width))
    if family == "benford":
        # the observed side buckets by FIRST SIGNIFICANT DIGIT — a pure
        # ingestion projection (same cross-engine-exact string
        # extraction as batch), then the digit IS the unit-width bucket
        digit = first_digit_expr(column)
        sdf = (sdf.withColumn("__benford_digit", digit)
               .where(F.col("__benford_digit").isNotNull()))
        column, bucket_width = "__benford_digit", 1.0
    return stream_windowed_drift(
        sdf, column, ts_col, baseline=baseline,
        bucket_width=float(bucket_width), psi_max=psi_max, ks_max=ks_max,
        chi2_max=chi2_max, window_duration=window_duration,
        watermark=watermark)


def stream_tdigest_quantile_verdicts(
    sdf: DataFrame,
    column: str,
    ts_col: str,
    q: float,
    lo: float | None = None,
    hi: float | None = None,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
    delta: int = 100,
) -> DataFrame:
    """Streaming ``x-quantile {"backend": "tdigest"}``: per-window
    quantile verdicts from a MERGEABLE t-digest carried in state — the
    check Spark's windowed aggregates cannot express (``percentile_
    approx`` is not exposed as a streaming-stateful aggregate, and raw
    values must not accumulate per window at 10^12-row scale). The
    window's state IS the digest (<= delta centroids regardless of row
    count); every micro-batch merges its Arrow batches in (the same
    ``_merge`` primitive as the batch operator, so cross-batch
    accumulation is exactly digest-of-digests), and the watermark
    closing the window emits one verdict row.

    Accuracy contract mirrors the batch operator: exact (==
    ``np.quantile`` linear) while the window's point count stays in the
    singleton regime, documented rank-error bound when compressed —
    per-window parity with ``tdigest_quantiles`` is pytest-asserted.

    Output: (window_start, q, value, passed)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from jsonschema_valid_spark.operators import tdigest as td

    td._ensure_worker_pickling()
    if not (0.0 <= float(q) <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    if lo is None and hi is None:
        raise ValueError("stream_tdigest_quantile_verdicts needs lo "
                         "and/or hi")
    qq, dd = float(q), int(delta)
    lo_f = None if lo is None else float(lo)
    hi_f = None if hi is None else float(hi)

    dur = F.expr(f"INTERVAL {window_duration}")
    dur_ms = sdf.sparkSession.range(1).select(
        (F.timestamp_millis(F.lit(0).cast("long")) + dur).cast("long")
    ).first()[0] * 1000

    out_schema = ("window_start timestamp, q double, value double, "
                  "passed boolean")
    state_schema = "means array<double>, weights array<double>"

    def update(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            means, weights = state.get
            state.remove()
            val = td.tdigest_quantile_value(
                np.asarray(means, dtype=float),
                np.asarray(weights, dtype=float), qq)
            ok = True
            if lo_f is not None:
                ok = ok and val >= lo_f
            if hi_f is not None:
                ok = ok and val <= hi_f
            yield pd.DataFrame({
                "window_start": [key_tuple[0]], "q": [qq],
                "value": [val], "passed": [bool(ok)],
            })
            return
        if state.exists:
            means, weights = state.get
            m = np.asarray(means, dtype=float)
            w = np.asarray(weights, dtype=float)
        else:
            m = np.empty(0)
            w = np.empty(0)
        for pdf in pdfs:
            vals = pdf["val"].to_numpy(dtype=float)
            vals = vals[~np.isnan(vals)]
            if vals.size:
                m, w = td._merge(np.concatenate([m, vals]),
                                 np.concatenate([w, np.ones(vals.size)]),
                                 dd)
        state.update((m.tolist(), w.tolist()))
        end_ms = int(key_tuple[0].value // 1_000_000) + dur_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(end_ms, wm + 1))
        return

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window_duration).getField("start")
            .alias("__wstart"),
            F.col(column).cast("double").alias("val"),
            F.col(ts_col),
        )
    )
    return prepped.groupBy("__wstart").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_rowcount_verdicts(
    sdf: DataFrame,
    group_col: str,
    ts_col: str,
    min_count: int | None = None,
    max_count: int | None = None,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-rowCount`` (operators/cardinality.py lifted to
    event-time windows): did the right AMOUNT arrive per group per
    window — the volume contract a feed makes ("every device reports
    50-70 readings per hour") that row checks can't see. Pure NATIVE
    windowed aggregation: one ``groupBy(window, group).count()`` with
    watermark, emitted in append mode as windows close; no Python state,
    no UDF — state is Spark's windowed-agg store, bounded by the
    watermark horizon.

    Caveat shared with the batch keyword: a group with ZERO rows in a
    window emits nothing — a ``min`` bound only polices groups that
    showed up at all; pair with :func:`stream_freshness_alerts` when
    total absence must alert (that is exactly the check an event-time
    TIMER exists for).

    Output: (window_start, group, n, passed) — one verdict row per
    (window x group) including passing ones, the per-partition
    pass/fail shape."""
    if min_count is None and max_count is None:
        raise ValueError("stream_rowcount_verdicts needs min and/or max")
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 F.coalesce(F.col(group_col).cast("string"),
                            F.lit("<null>")).alias("group"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    passed = F.lit(True)
    if min_count is not None:
        passed = passed & (F.col("n") >= int(min_count))
    if max_count is not None:
        passed = passed & (F.col("n") <= int(max_count))
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        "group", "n", passed.alias("passed"))


def stream_distinct_ratio_verdicts(
    sdf: DataFrame,
    column: str,
    ts_col: str,
    group_col: str | None = None,
    min_ratio: float | None = None,
    max_ratio: float | None = None,
    min_count: int = 1,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-distinctRatio`` (operators/cardinality.py lifted to
    event-time windows): distinct/count of ``column`` per window (and
    per ``group_col``) within bounds — the RATE failures the batch
    keyword catches (fan-out duplication, id collapse) surfacing in the
    window where they started, instead of diluted into the day's
    aggregate.  Pure NATIVE windowed aggregation:
    ``approx_count_distinct`` (HLL, mergeable across micro-batches —
    exact distinct is not available to streaming aggregation, and the
    sketch error is ~2%: declare bounds with headroom) + count, append
    mode on watermark close; no Python state.

    Output: (window_start, group, ratio, n, passed) — one verdict row
    per (window × group) including passing ones; windows under
    ``min_count`` pass (suppressed)."""
    if min_ratio is None and max_ratio is None:
        raise ValueError("stream_distinct_ratio_verdicts needs min "
                         "and/or max")
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
           if group_col is not None else F.lit("<global>"))
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 grp.alias("group"))
        .agg(F.approx_count_distinct(F.col(column)).alias("d"),
             F.count(F.col(column)).alias("n"))
    )
    ratio = F.try_divide(F.col("d"), F.col("n"))
    passed = F.lit(True)
    if min_ratio is not None:
        passed = passed & (ratio >= F.lit(float(min_ratio)))
    if max_ratio is not None:
        passed = passed & (ratio <= F.lit(float(max_ratio)))
    passed = F.when(F.col("n") < int(min_count), F.lit(True)) \
        .when(ratio.isNull(), F.lit(True)).otherwise(passed)
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        "group",
        F.coalesce(ratio, F.lit(0.0)).cast("double").alias("ratio"),
        "n", passed.alias("passed"))


def stream_entropy_verdicts(
    sdf: DataFrame,
    column: str,
    ts_col: str,
    categories: list[str],
    group_col: str | None = None,
    min_h: float | None = None,
    max_h: float | None = None,
    min_count: int = 1,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-entropy`` (operators/entropy.py lifted to
    event-time windows): Shannon entropy (bits) of a categorical mix
    per window (and per ``group_col``) within bounds — the mix COLLAPSE
    ("the 14:00 deploy made the balanced crawl 80% one source")
    surfacing in the window where it started.

    Streaming aggregation cannot chain two groupBys (the batch operator
    counts per value, then aggregates the counts), so the category
    domain must be DECLARED — exactly the categorical-drift contract
    (stream_windowed_drift(categorical=True)): each declared category
    becomes one conditional count in a single NATIVE windowed aggregate
    (k+1 columns, k = len(categories)); undeclared values collapse into
    an ``other`` bucket so novel categories still carry entropy mass.
    H = log2(n) − (Σ c·log2(c))/n over those k+1 count columns — pure
    column algebra, append mode on watermark close, no Python state;
    per-window results equal the batch operator on the collapsed
    column (pytest-pinned).

    Output: (window_start, group, entropy_bits, n, passed) — one
    verdict row per (window × group) including passing ones; windows
    under ``min_count`` pass (suppressed).  NULL values are excluded,
    matching batch."""
    if min_h is None and max_h is None:
        raise ValueError("stream_entropy_verdicts needs min and/or max")
    if not categories:
        raise ValueError("stream_entropy_verdicts needs a declared "
                         "category list (the streaming-aggregation "
                         "contract; use the batch operator for "
                         "undeclared domains)")
    cats = sorted(set(str(c) for c in categories))
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
           if group_col is not None else F.lit("<global>"))
    c = F.col(column).cast("string")
    aggs = [
        F.sum(F.when(c == F.lit(cat), 1).otherwise(0)).alias(f"__c{i}")
        for i, cat in enumerate(cats)
    ]
    aggs.append(
        F.sum(F.when(c.isNotNull() & ~c.isin(cats), 1).otherwise(0))
        .alias("__cother"))
    agg = (
        sdf.where(c.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 grp.alias("group"))
        .agg(*aggs)
    )
    names = [f"__c{i}" for i in range(len(cats))] + ["__cother"]
    n = None
    s = None
    for nm in names:
        cd = F.col(nm).cast("double")
        term = F.when(F.col(nm) > 0, cd * F.log2(cd)).otherwise(F.lit(0.0))
        n = cd if n is None else n + cd
        s = term if s is None else s + term
    h = F.greatest(F.log2(n) - s / n, F.lit(0.0))
    passed = F.lit(True)
    if min_h is not None:
        passed = passed & (h >= F.lit(float(min_h)))
    if max_h is not None:
        passed = passed & (h <= F.lit(float(max_h)))
    passed = F.when(n < F.lit(float(int(min_count))), F.lit(True)) \
        .otherwise(passed)
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        "group",
        h.cast("double").alias("entropy_bits"),
        n.cast("long").alias("n"),
        passed.alias("passed"))


def stream_cohort_parity_verdicts(
    sdf: DataFrame,
    ts_col: str,
    cohort_col: str,
    cohorts: list[str],
    baseline: str,
    max_gap: float,
    expr: str | None = None,
    column: str | None = None,
    min_count: int = 1,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-cohortParity`` (operators/parity_cohort.py lifted
    to event-time windows): each cohort's metric vs the baseline
    cohort's, per window — the one-arm regression surfacing in the
    window where the deploy landed, while global drift (both cohorts
    move together) stays silent.

    Streaming aggregation cannot chain a second pass over cohort cells,
    so the cohort domain is DECLARED (the ``stream_entropy_verdicts``
    contract): each declared cohort becomes one conditional (sum, count)
    pair in a single NATIVE windowed aggregate; the per-cohort rows are
    then a pure post-aggregation projection (inline explode — legal in
    append mode, no second groupBy).  Metric: rate of ``expr`` (NULL ⇒
    fail, the batch convention) when ``expr`` is given, else mean of
    ``column``.

    Output: (window_start, cohort, metric, base_metric, gap, n, passed)
    — one row per (window × declared cohort); thin cohorts, absent
    baselines, and the baseline row itself pass (gap 0 for baseline,
    NULL→0 when suppressed)."""
    if (expr is None) == (column is None):
        raise ValueError("stream_cohort_parity_verdicts needs exactly "
                         "one of expr (rate) / column (mean)")
    if not (float(max_gap) > 0):
        raise ValueError(f"max_gap must be > 0, got {max_gap}")
    cohorts = [str(c) for c in cohorts]
    if str(baseline) not in cohorts:
        raise ValueError("baseline must be among the declared cohorts")
    ch = F.col(cohort_col).cast("string")
    if expr is not None:
        val = F.coalesce(F.expr(expr).cast("boolean"),
                         F.lit(False)).cast("double")
        cnt = F.lit(1.0)
    else:
        val = F.col(column).cast("double")
        cnt = F.when(F.col(column).isNotNull(), 1.0).otherwise(0.0)
    aggs = []
    for i, c in enumerate(cohorts):
        sel = ch == F.lit(c)
        aggs.append(F.sum(F.when(sel, val).otherwise(F.lit(0.0)))
                    .alias(f"__s{i}"))
        aggs.append(F.sum(F.when(sel, cnt).otherwise(F.lit(0.0)))
                    .alias(f"__n{i}"))
    agg = (
        sdf.where(ch.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"))
        .agg(*aggs)
    )
    bi = cohorts.index(str(baseline))
    base_n = F.col(f"__n{bi}")
    base_m = F.when(base_n >= F.lit(float(int(min_count))),
                    F.col(f"__s{bi}") / base_n)
    pairs = []
    for i, c in enumerate(cohorts):
        m = F.when(F.col(f"__n{i}") > 0,
                   F.col(f"__s{i}") / F.col(f"__n{i}"))
        pairs.append(F.struct(
            F.lit(c).alias("cohort"),
            m.alias("metric"),
            F.col(f"__n{i}").cast("long").alias("n")))
    exploded = agg.select(
        F.col("__w").getField("start").alias("window_start"),
        base_m.alias("__bm"),
        F.explode(F.array(*pairs)).alias("__c"))
    m = F.col("__c").getField("metric")
    n = F.col("__c").getField("n")
    cohort = F.col("__c").getField("cohort")
    gap = m - F.col("__bm")
    bad = (F.col("__bm").isNotNull() & m.isNotNull()
           & (cohort != F.lit(str(baseline)))
           & (n >= F.lit(int(min_count)))
           & (F.abs(gap) > F.lit(float(max_gap))))
    return exploded.select(
        "window_start",
        cohort.alias("cohort"),
        F.coalesce(m, F.lit(0.0)).cast("double").alias("metric"),
        F.coalesce(F.col("__bm"), F.lit(0.0)).cast("double")
        .alias("base_metric"),
        F.coalesce(gap, F.lit(0.0)).cast("double").alias("gap"),
        n.alias("n"),
        (~bad).alias("passed"))


def stream_funnel_conversions(
    sdf: DataFrame,
    key: str,
    ts_col: str,
    steps: list[tuple[str, str]],
    window_duration: str = "1 hour",
    watermark: str = "0 seconds",
    within_seconds: float | None = None,
) -> DataFrame:
    """Streaming ordered funnel (operators/funnel.py lifted to
    event-time windows): per (window × key), how deep did the key
    convert through the ordered ``steps`` chain WITHIN the window —
    step i completes at the earliest event matching condition i
    STRICTLY AFTER the step-(i-1) time (first-touch, identical to the
    batch rule: the batch running-min chain and this final-value
    iteration provably agree, since the running step-(i-1) minimum at
    any qualifying event already equals its final value).

    Execution: one NATIVE windowed aggregation collects each key's
    in-window events as a sorted (ts, flags) array (state bounded by
    events-per-key-per-window — document hot keys; there is no
    unbounded cross-window state, which is also the semantic choice:
    chains do not span windows, exactly like batch ``funnel`` with
    ``within_seconds`` = the window), then the k-step chain is computed
    by k staged array expressions (filter + array_min per step — each
    stage references the PREVIOUS stage's scalar column, so no
    HOF-lambda re-evaluation blowup).  Emitted in append mode as
    windows close.

    Output: (window_start, key, depth, step_ts array<long> micros) —
    depth = number of chain steps completed in the window."""
    if not steps:
        raise ValueError("steps must be non-empty")
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = F.struct(
        m.alias("m"),
        *[F.coalesce(F.expr(cond).cast("boolean"), F.lit(False))
          .alias(f"c{i}") for i, (_, cond) in enumerate(steps)])
    agg = (
        sdf.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 F.col(key).alias("key"))
        .agg(F.sort_array(F.collect_list(ev)).alias("__evs"))
    )
    out = agg
    tol = (None if within_seconds is None
           else int(round(float(within_seconds) * 1_000_000)))
    # closure FACTORIES returning single-arg lambdas — a default-arg
    # lambda reads as a 2-arg (element, index) HOF and the index binds
    # into the field name (the documented Spark-4 arity pitfall)
    def _first(flag):
        return lambda e: e[flag]

    def _chained(flag, prev):
        return lambda e: e[flag] & (e["m"] > prev)

    def _chained_tol(flag, prev, t0, us):
        return lambda e: (e[flag] & (e["m"] > prev)
                          & (e["m"] <= t0 + F.lit(us)))

    for i in range(len(steps)):
        flag = f"c{i}"
        if i == 0:
            sel = _first(flag)
        elif tol is None:
            sel = _chained(flag, F.col(f"__t{i - 1}"))
        else:
            sel = _chained_tol(flag, F.col(f"__t{i - 1}"),
                               F.col("__t0"), tol)
        out = out.withColumn(
            f"__t{i}",
            F.array_min(F.transform(F.filter(F.col("__evs"), sel),
                                    lambda e: e["m"])))
    ts_arr = F.array(*[F.col(f"__t{i}") for i in range(len(steps))])
    depth = F.size(F.filter(ts_arr, lambda t: t.isNotNull()))
    return out.select(
        F.col("__w").getField("start").alias("window_start"),
        "key",
        depth.alias("depth"),
        ts_arr.alias("step_ts"))


def stream_trend_verdicts(
    sdf: DataFrame,
    column: str,
    order_col: str,
    ts_col: str,
    group_col: str | None = None,
    min_slope: float | None = None,
    max_slope: float | None = None,
    min_count: int = 3,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-trend`` (operators/trend.py lifted to event-time
    windows): the OLS slope of ``column`` vs ``order_col`` per window
    (and per ``group_col``) within bounds — rate-of-change verdicts in
    the window where the creep started ("queue depth grew 40/hour
    during the 14:00 window").  The slope is a moment statistic, so the
    whole fit is FOUR mergeable sums + a count:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over the
    pairwise-complete slice — pure NATIVE windowed aggregation, append
    on watermark close, no Python state; micro-batches merge exactly
    (sums are associative).  Degenerate windows (constant ``order_col``)
    have an undefined slope and pass (try_divide NULL), as do windows
    under ``min_count`` pairs.

    Output: (window_start, group, slope, n, passed)."""
    if min_slope is None and max_slope is None:
        raise ValueError("stream_trend_verdicts needs min and/or max")
    x = F.col(order_col).cast("double")
    y = F.col(column).cast("double")
    both = x.isNotNull() & y.isNotNull()
    px = F.when(both, x)
    py = F.when(both, y)
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
           if group_col is not None else F.lit("<global>"))
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 grp.alias("group"))
        .agg(F.sum(px).alias("sx"), F.sum(py).alias("sy"),
             F.sum(px * py).alias("sxy"), F.sum(px * px).alias("sxx"),
             F.count(F.when(both, 1)).alias("n"))
    )
    slope = F.try_divide(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    passed = F.lit(True)
    if min_slope is not None:
        passed = passed & (slope >= F.lit(float(min_slope)))
    if max_slope is not None:
        passed = passed & (slope <= F.lit(float(max_slope)))
    passed = F.when(F.col("n") < int(min_count), F.lit(True)) \
        .when(slope.isNull(), F.lit(True)).otherwise(passed)
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        "group",
        F.coalesce(slope, F.lit(0.0)).cast("double").alias("slope"),
        "n", passed.alias("passed"))


def stream_correlation_verdicts(
    sdf: DataFrame,
    column: str,
    with_col: str,
    ts_col: str,
    group_col: str | None = None,
    min_corr: float | None = None,
    max_corr: float | None = None,
    min_count: int = 3,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-correlation`` (operators/correlation.py lifted to
    event-time windows): per-window Pearson r between two columns within
    bounds — decoupling surfaces in the window where it started ("the
    paired sensors diverged at 14:00").  Like streaming x-trend, the
    whole statistic is mergeable sums: r = (n·Σxy − Σx·Σy) /
    (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) over the pairwise-complete
    slice — pure NATIVE windowed aggregation, exact cross-batch merge,
    append on watermark close, no Python state.  Zero-variance windows
    have undefined r and pass (try_divide NULL), as do windows under
    ``min_count`` pairs.

    Output: (window_start, group, corr, n, passed)."""
    if min_corr is None and max_corr is None:
        raise ValueError("stream_correlation_verdicts needs min and/or max")
    x = F.col(column).cast("double")
    y = F.col(with_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    px = F.when(both, x)
    py = F.when(both, y)
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
           if group_col is not None else F.lit("<global>"))
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 grp.alias("group"))
        .agg(F.sum(px).alias("sx"), F.sum(py).alias("sy"),
             F.sum(px * py).alias("sxy"),
             F.sum(px * px).alias("sxx"), F.sum(py * py).alias("syy"),
             F.count(F.when(both, 1)).alias("n"))
    )
    # greatest(·, 0): float rounding can push a mathematically
    # non-negative n·Σx² − (Σx)² a hair below zero — sqrt would yield
    # NaN, and NaN compares LARGER than any double in Spark, silently
    # passing a min bound; clamped, zero variance → try_divide NULL
    vx = F.greatest(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
    vy = F.greatest(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0))
    corr = F.try_divide(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.sqrt(vx) * F.sqrt(vy))
    passed = F.lit(True)
    if min_corr is not None:
        passed = passed & (corr >= F.lit(float(min_corr)))
    if max_corr is not None:
        passed = passed & (corr <= F.lit(float(max_corr)))
    passed = F.when(F.col("n") < int(min_count), F.lit(True)) \
        .when(corr.isNull(), F.lit(True)).otherwise(passed)
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        "group",
        F.coalesce(corr, F.lit(0.0)).cast("double").alias("corr"),
        "n", passed.alias("passed"))


def stream_compliance_verdicts(
    sdf: DataFrame,
    expr: str,
    ts_col: str,
    group_col: str | None = None,
    min_rate: float | None = None,
    max_rate: float | None = None,
    min_count: int = 1,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-compliance`` (operators/compliance.py lifted to
    event-time windows): the pass-rate of an arbitrary SQL boolean per
    window (and per ``group_col``) within bounds — the error budget
    evaluated where it breaks ("the 14:00 deploy dropped value-positivity
    to 70%") instead of diluted into the day's aggregate.  NULL
    predicate results count as NON-compliant, matching batch.  Pure
    NATIVE windowed aggregation (conditional sum + count), append mode
    on watermark close; no Python state.

    Output: (window_start, group, rate, pass_n, n, passed) — one row per
    (window × group) including passing ones; windows under
    ``min_count`` pass (suppressed)."""
    if min_rate is None and max_rate is None:
        raise ValueError("stream_compliance_verdicts needs min and/or max")
    ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
           if group_col is not None else F.lit("<global>"))
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 grp.alias("group"))
        .agg(F.sum(ok.cast("long")).alias("pass_n"),
             F.count(F.lit(1)).alias("n"))
    )
    rate = F.try_divide(F.col("pass_n"), F.col("n"))
    passed = F.lit(True)
    if min_rate is not None:
        passed = passed & (rate >= F.lit(float(min_rate)))
    if max_rate is not None:
        passed = passed & (rate <= F.lit(float(max_rate)))
    passed = F.when(F.col("n") < int(min_count), F.lit(True)) \
        .otherwise(passed)
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        "group",
        F.coalesce(rate, F.lit(0.0)).cast("double").alias("rate"),
        "pass_n", "n", passed.alias("passed"))


def stream_frequency_alerts(
    sdf: DataFrame,
    column: str,
    ts_col: str,
    max_fraction: float,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
    k: int | None = None,
) -> DataFrame:
    """Streaming ``x-maxFrequency`` (operators/frequency.py lifted to an
    unbounded stream): per event-time window, alert on values that
    DOMINATE the window's traffic. The batch operator can re-count
    candidates exactly; a stream cannot re-read its past, so the state IS
    the Misra-Gries summary — k counters + the window total per window,
    merged across micro-batches (the sketch's mergeability is what makes
    the cross-batch accumulation sound), bounded state regardless of how
    many distinct values flow through.

    Emitted when the watermark closes the window (EventTimeTimeout):
    one row per flagged value with the sketch's certainty made explicit —
    ``status='violation'`` when the ESTIMATE alone exceeds the threshold
    (MG never overcounts, so true_count >= est > T: certain), and
    ``status='suspect'`` when only est + total/(k+1) exceeds it (the
    undercount slack could hide a violator; raise k to shrink this band).
    With k >= the window's distinct values the summary is exact and the
    violation set equals the batch operator's per window
    (pytest-asserted parity).

    Output: (window_start, value, est, total, status)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from jsonschema_valid_spark.operators.frequency import (
        _NULL_SENTINEL,
        _frac_ratio,
    )

    if not (0.0 < float(max_fraction) <= 1.0):
        raise ValueError(f"max_fraction must be in (0, 1], got "
                         f"{max_fraction}")
    if k is None:
        import math as _math

        k = max(64, _math.ceil(8.0 / float(max_fraction)))
    k = int(k)
    if k < 2:
        raise ValueError(f"sketch k must be >= 2, got {k}")
    num, den = _frac_ratio(max_fraction)

    dur = F.expr(f"INTERVAL {window_duration}")
    dur_ms = sdf.sparkSession.range(1).select(
        (F.timestamp_millis(F.lit(0).cast("long")) + dur).cast("long")
    ).first()[0] * 1000

    out_schema = ("window_start timestamp, value string, est long, "
                  "total long, status string")
    state_schema = "vals array<string>, cnts array<long>, total long"

    def update(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            vals, cnts, total = state.get
            state.remove()
            rows = []
            slack = total // (k + 1)
            for v, c in zip(vals, cnts):
                if c * den > num * total:
                    rows.append((v, c, "violation"))
                elif (c + slack) * den > num * total:
                    rows.append((v, c, "suspect"))
            if rows:
                yield pd.DataFrame({
                    "window_start": [key_tuple[0]] * len(rows),
                    "value": [r[0] for r in rows],
                    "est": [r[1] for r in rows],
                    "total": [total] * len(rows),
                    "status": [r[2] for r in rows],
                })
            return
        if state.exists:
            vals, cnts, total = state.get
            counters = dict(zip(vals, cnts))
        else:
            counters, total = {}, 0
        for pdf in pdfs:
            total += len(pdf)
            for v, c in pdf["val"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut for v, c in counters.items()
                            if c > cut}
        state.update((list(counters), [int(c) for c in counters.values()],
                      int(total)))
        end_ms = int(key_tuple[0].value // 1_000_000) + dur_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(end_ms, wm + 1))
        return

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window_duration).getField("start")
            .alias("__wstart"),
            F.coalesce(F.col(column).cast("string"),
                       F.lit(_NULL_SENTINEL)).alias("val"),
            # the watermark-tagged event-time column must survive into
            # the stateful operator's input or Spark rejects
            # EventTimeTimeout ("watermark must be specified")
            F.col(ts_col),
        )
    )
    return prepped.groupBy("__wstart").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_windowed_drift(sdf: DataFrame, column: str, ts_col: str,
                          baseline: dict, bucket_width: float = 1.0,
                          psi_max: float | None = 0.25,
                          ks_max: float | None = None,
                          chi2_max: float | None = None,
                          emd_max: float | None = None,
                          kl_max: float | None = None,
                          jsd_max: float | None = None,
                          window_duration: str = "1 minute",
                          watermark: str = "2 minutes",
                          categorical: bool = False,
                          edges: list | None = None,
                          joint: list | None = None) -> DataFrame:
    """Per-window drift verdicts vs a literal baseline histogram — the
    streaming form of ``operators/drift.py``, now with the SAME three
    statistics as batch (VERDICT r3 item 5): PSI, binned-ECDF KS,
    Pearson chi-square, binned Wasserstein-1 EMD (r4), and KL /
    Jensen–Shannon divergence (r4 wave 15), each gated by its own
    threshold (pass ``None`` to skip a statistic; defaults keep the r3
    PSI-only surface).

    Plan: windowed histogram (stateful agg #1: state = #windows × #buckets
    counters) → per-window collect of the tiny (bucket, count) list (stateful
    agg #2, chained via ``window_time`` — Spark supports multiple stateful
    aggregations in append mode) → all three statistics computed with native
    array HOFs over ≤ #buckets entries per window (the KS cumulative sum is
    an O(#buckets²) nested-slice aggregate — #buckets is a compile-time
    constant, so this is driver-scale math regardless of stream volume).
    The baseline rides as a literal map expression; no Python at runtime,
    state bounded by the watermark.

    ``joint=[{column,bucketWidth?}, ...]`` lifts the batch JOINT mode
    (operators/drift.py joint_histogram) onto the stream: the baseline is
    keyed by composite cell LABEL ("48|news"), cells map to indices of the
    sorted declared list at ingestion (undeclared → -1, "other"), rows
    with a NULL in any dim are excluded, and KS/EMD are refused
    (composite cells are unordered).

    ``categorical=True`` lifts the batch categorical mode
    (operators/drift.py categorical_histogram) onto the stream: the
    baseline is keyed by CATEGORY STRING, categories map to indices of
    the sorted declared list at ingestion (one literal array_position
    expression — every undeclared value collapses to bucket −1,
    "other"), and everything downstream is the identical integer-bucket
    machinery. KS/EMD are refused (categories are unordered).

    Emits one verdict row per closed window per enabled statistic:
    ``(window_start, window_end, check_id, passed, metric_value, threshold)``.
    """
    eps = 1e-9
    if joint is not None:
        # joint (multi-column) mode — the streaming twin of
        # operators/drift.py joint_histogram: baseline keyed by composite
        # cell LABEL, cells map to sorted-declared indices at ingestion
        # (undeclared → -1 "other"); unordered → KS/EMD refused
        from jsonschema_valid_spark.operators.drift import joint_cell_parts

        if categorical or edges is not None:
            raise ValueError("joint is exclusive with categorical/edges")
        bad = [n for n, t in (("ksMax", ks_max), ("emdMax", emd_max))
               if t is not None]
        if bad:
            raise ValueError(
                f"{bad} not valid for joint drift — composite cells are "
                "unordered (use psi_max/chi2_max/kl_max/jsd_max)")
        cells = sorted(str(k) for k in baseline)
        int_baseline = {i: int(baseline[c]) for i, c in enumerate(cells)}
        label, null_guard, _ = joint_cell_parts(joint, column)
        bucket_expr = (
            F.array_position(F.array(*[F.lit(c) for c in cells]), label)
            - 1).cast("long")
    elif categorical:
        bad = [n for n, t in (("ksMax", ks_max), ("emdMax", emd_max))
               if t is not None]
        if bad:
            raise ValueError(
                f"{bad} not valid for categorical drift — categories "
                "are unordered (use psi_max/chi2_max)")
        cats = sorted(str(k) for k in baseline)
        int_baseline = {i: int(baseline[c]) for i, c in enumerate(cats)}
        bucket_expr = (
            F.array_position(F.array(*[F.lit(c) for c in cats]),
                             F.col(column).cast("string"))
            - 1).cast("long")
        null_guard = F.col(column).isNotNull()
    elif edges is not None:
        # equi-depth mode (operators/drift.py quantile_histogram): buckets
        # bounded by the baseline's quantile edges; KS stays valid
        # (ordered), EMD is not (irregular widths)
        if emd_max is not None:
            raise ValueError("emd_max not valid for quantile-edged drift "
                             "— bucket widths are irregular")
        es = [float(e) for e in edges]
        if not es or sorted(es) != es or len(set(es)) != len(es):
            raise ValueError("edges must be a non-empty strictly "
                             f"increasing list, got {edges!r}")
        int_baseline = {int(k): int(v) for k, v in baseline.items()}
        earr = F.array(*[F.lit(e) for e in es])
        vcol = F.col(column).cast("double")
        bucket_expr = F.size(F.filter(earr, lambda e: vcol >= e)) \
            .cast("long")
        null_guard = F.col(column).isNotNull()
    else:
        int_baseline = {int(k): int(v) for k, v in baseline.items()}
        bucket_expr = F.floor(
            F.col(column) / F.lit(float(bucket_width))).cast("long")
        null_guard = F.lit(True)
    baseline = int_baseline
    btotal = float(sum(baseline.values())) or 1.0
    bmap = F.create_map(*[F.lit(v).cast("long")
                          for kv in sorted(baseline.items())
                          for v in (int(kv[0]), int(kv[1]))])
    bbuckets = F.array(*[F.lit(int(b)).cast("long") for b in sorted(baseline)])

    wm = sdf.withWatermark(ts_col, watermark).where(null_guard)
    hist = (
        wm.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            bucket_expr.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_w = (
        hist.groupBy(F.window(F.window_time("w"), window_duration).alias("w"))
        .agg(F.collect_list(F.struct("bucket", "cnt")).alias("h"))
    )

    obs_total = F.aggregate(
        "h", F.lit(0).cast("long"), lambda a, e: a + e["cnt"]).cast("double")
    obs_buckets = F.transform("h", lambda e: e["bucket"])
    obs_map = F.map_from_entries(
        F.transform("h", lambda e: F.struct(e["bucket"].alias("key"),
                                            e["cnt"].alias("value"))))

    stage = per_w.select(
        "w", "h",
        obs_total.alias("__ot"),
        obs_buckets.alias("__ob"),
        obs_map.alias("__om"),
        # union bucket set, sorted — every statistic walks this array, so
        # the batch normalization domain (obs ∪ base) is replayed exactly
        F.array_sort(F.array_union(obs_buckets, bbuckets)).alias("__ub"),
    )

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
    # KS: max over bucket boundaries of |cum p_obs − cum p_base|; the
    # cumulative sum at position i re-aggregates the prefix slice
    cum_gaps = F.transform(
        F.col("__ub"),
        lambda b, i: F.abs(F.aggregate(
            F.slice(F.col("__ub"), F.lit(1), i + 1), F.lit(0.0),
            lambda a, x: a + (p_obs(x) - p_base(x)))))
    ks_val = F.coalesce(F.array_max(cum_gaps), F.lit(0.0))
    # EMD: Σ_i |cumΔ(i)| · (ub[i+1] − ub[i]) · width — the gap factor
    # integrates the piecewise-constant CDF difference across empty
    # buckets exactly like the batch emd_value_df (last bucket: gap 0)
    emd_terms = F.transform(
        F.col("__ub"),
        lambda b, i: F.abs(F.aggregate(
            F.slice(F.col("__ub"), F.lit(1), i + 1), F.lit(0.0),
            lambda a, x: a + (p_obs(x) - p_base(x))))
        * (F.coalesce(F.try_element_at(F.col("__ub"), (i + 2).cast("int")),
                      b) - b).cast("double")
        * F.lit(float(bucket_width)))
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

    verdicts = []
    for stat, val, tau in (("psi", psi_val, psi_max),
                           ("ks", ks_val, ks_max),
                           ("chi2", chi2_val, chi2_max),
                           ("emd", emd_val, emd_max),
                           ("kl", kl_val, kl_max),
                           ("jsd", jsd_val, jsd_max)):
        if tau is None:
            continue
        verdicts.append(F.struct(
            F.lit(f"x-drift/{column}/{stat}").alias("check_id"),
            (val <= F.lit(float(tau))).alias("passed"),
            val.cast("double").alias("metric_value"),
            F.lit(float(tau)).cast("double").alias("threshold"),
        ))
    if not verdicts:
        raise ValueError(
            "at least one of psi_max/ks_max/chi2_max/emd_max/kl_max/"
            "jsd_max required")
    return (
        stage.select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.explode(F.array(*verdicts)).alias("v"))
        .select("window_start", "window_end", "v.*")
    )


def quarantine_router(suite, out_dir: str, context: dict | None = None):
    """foreachBatch router sharing ONE code path with the batch quarantine
    splitter (``engine.split_valid`` — VERDICT r2 item 8): failing rows land
    in ``{out_dir}/quarantine``, clean rows in ``{out_dir}/clean``. Each
    micro-batch writes its own ``batch_id=<n>`` directory with overwrite, so
    a retried batch replaces exactly its own files (idempotent under
    at-least-once foreachBatch delivery, unlike a plain append).

    Usage::

        q = (sdf.writeStream
             .foreachBatch(quarantine_router(suite, out_dir))
             .option("checkpointLocation", f"{out_dir}/_ckpt")
             .trigger(availableNow=True).start())
    """
    from jsonschema_valid_spark.engine import split_valid

    def route(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            clean, bad = split_valid(suite, batch_df, context=context)
            clean.write.mode("overwrite").parquet(
                f"{out_dir}/clean/batch_id={batch_id}")
            bad.write.mode("overwrite").parquet(
                f"{out_dir}/quarantine/batch_id={batch_id}")
        finally:
            batch_df.unpersist()

    return route


def stream_session_stats(sdf: DataFrame, key: str, ts_col: str,
                         gap_seconds: float,
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming gap sessionization on Spark's NATIVE ``session_window``
    — the stateful twin of ``operators/temporal.py session_stats``. One
    roll-up row per closed session: ``(key, n_events, start_micros,
    end_micros, duration_micros)``.

    Native session windows merge an event whose gap is AT MOST
    ``gap_seconds`` (an event at exactly ``prev + gap`` still extends
    the session — verified empirically, pinned by the boundary case in
    tests/test_stream_sessions.py), which is the same strictly-greater
    break as the batch operator: streaming(gap) == batch(gap) exactly,
    session for session. State is one (start, end, counters) tuple per OPEN session
    per key, closed and emitted (append mode) once the watermark passes
    the session end + gap — bounded by key cardinality, not stream
    volume, and Spark merges sessions across micro-batches natively
    (no hand-rolled applyInPandasWithState needed when the engine
    already ships the operator).
    """
    gap_us = int(round(float(gap_seconds) * 1_000_000))
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.col(key),
                 F.session_window(F.col(ts_col), f"{gap_us} microseconds"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min(m).alias("start_micros"),
             F.max(m).alias("end_micros"))
        .select(F.col(key), F.col("n_events"),
                F.col("start_micros"), F.col("end_micros"),
                (F.col("end_micros")
                 - F.col("start_micros")).alias("duration_micros"))
    )


def stream_event_order_violations(
    sdf: DataFrame,
    column: str,
    by: str,
    first: str,
    then: str,
    require_first: bool = True,
    watermark: str = "10 minutes",
    check_id: str | None = None,
) -> DataFrame:
    """Streaming ``x-eventOrder`` (operators/temporal.py
    event_order_violations lifted to an unbounded stream): causality
    between two predicate-selected event subsets per group — "no
    purchase before signup" — where the earliest-first/earliest-then
    knowledge must survive micro-batch boundaries.  State per group is
    (first_seen, first_min, then_seen, then_min, emitted): five scalars,
    O(#groups) regardless of stream length; at most ONE violation row
    per group ever (matching the batch operator's one-row-per-group
    shape).

    Emission logic in event-time order within a batch, arrival order
    across batches (same contract as stream_monotonic_violations —
    parity with the batch operator holds when batches arrive in event-
    time order, asserted in tests): a ``then`` event with an earlier
    ``first`` on record violates when it precedes it; a ``then`` with NO
    ``first`` on record violates immediately iff ``require_first``,
    otherwise the group waits — if a later (in-order ⇒ later-in-time)
    ``first`` arrives, then_min < first_min proves the violation
    retroactively and it emits then.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cid = check_id or f"properties/{column}/x-eventOrder"
    exp_msg = (f"first({first}) at-or-before first({then}) per {by} "
               f"(stream)")
    out_schema = ("doc_id string, check_id string, observed string, "
                  "expected string")
    state_schema = ("first_seen boolean, first_min double, "
                    "then_seen boolean, then_min double, "
                    "emitted boolean")

    def update(key_tuple, pdfs, state: GroupState):
        fs, fm, ts_, tm, emitted = (
            state.get if state.exists
            else (False, 0.0, False, 0.0, False))
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
            .sort_values("__m", kind="mergesort")
        hit = None
        for m, is_f, is_t in zip(pdf["__m"].to_numpy(),
                                 pdf["__is_f"].to_numpy(),
                                 pdf["__is_t"].to_numpy()):
            if pd.isna(m):
                continue
            m = float(m)
            if bool(is_f) and not fs:
                fs, fm = True, m
                if ts_ and tm < fm and not emitted:
                    emitted = True
                    hit = (f"first={int(fm)},then={int(tm)}")
            if bool(is_t) and not ts_:
                ts_, tm = True, m
                if not emitted and (
                        (fs and tm < fm)
                        or (not fs and require_first)):
                    emitted = True
                    hit = (f"first={int(fm) if fs else 0},"
                           f"then={int(tm)}"
                           if fs else f"first=none,then={int(tm)}")
        state.update((fs, fm, ts_, tm, emitted))
        if hit is not None:
            yield pd.DataFrame({
                "doc_id": [str(key_tuple[0])],
                "check_id": cid,
                "observed": [hit],
                "expected": exp_msg,
            })

    m = F.unix_micros(F.col(column).cast("timestamp")).cast("double")
    prepped = (
        sdf.withWatermark(column, watermark)
        .select(
            F.col(by).alias("__by"),
            m.alias("__m"),
            F.expr(first).alias("__is_f"),
            F.expr(then).alias("__is_t"),
        )
    )
    return prepped.groupBy("__by").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_reciprocity_violations(
    sdf: DataFrame,
    column: str,
    with_col: str,
    ts_col: str,
    by: str | None = None,
    match_counts: bool = False,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-reciprocal`` (operators/reciprocity.py lifted to
    event-time windows): every (a, b) observed in a window must also
    occur reversed IN THAT WINDOW — the settlement-window form of the
    symmetry contract (the mirror posting of a double-entry transfer
    must arrive within the reconciliation window; a link row's reverse
    must land before the window closes, or the pair is flagged where
    the one-way write happened).  Cross-window mirrors are out of scope
    by design: matching "eventually" needs unbounded state, and batch
    ``reciprocity_violations`` over the settled table is the eventual
    check — this is its alerting twin.

    Same scale shape as batch: NEVER a self-join — both directions of
    a pair share one canonical cell ``(least, greatest)``, so the whole
    check is ONE native windowed aggregation carrying two conditional
    counts (state = Spark's windowed-agg store, one row per distinct
    in-flight pair, bounded by the watermark horizon) plus a pure
    post-aggregation filter — legal in append mode, no Python state.
    Self-pairs (a = b) have fwd = rev = 0 and can never be emitted.

    Output on window close: (window_start, pair, fwd, rev) — ``pair``
    matches the batch operator's doc_id rendering (``by|lo|hi`` when
    grouped) so window slices compare directly against
    ``reciprocity_violations`` rows."""
    a, b = F.col(column), F.col(with_col)
    gcols = [F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
             .alias("__g")] if by is not None else []
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .where(a.isNotNull() & b.isNotNull())
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 *gcols,
                 F.least(a, b).alias("__lo"),
                 F.greatest(a, b).alias("__hi"))
        .agg(F.sum(F.when(a < b, 1).otherwise(0)).alias("fwd"),
             F.sum(F.when(a > b, 1).otherwise(0)).alias("rev"))
    )
    fwd, rev = F.col("fwd"), F.col("rev")
    bad = (fwd != rev) if match_counts else ((fwd > 0) != (rev > 0))
    parts = ([F.col("__g"), F.lit("|")] if by is not None else [])
    pair = F.concat(*parts, F.col("__lo").cast("string"),
                    F.lit("|"), F.col("__hi").cast("string"))
    return agg.where(bad).select(
        F.col("__w").getField("start").alias("window_start"),
        pair.alias("pair"), "fwd", "rev")


def stream_seasonality_verdicts(
    sdf: DataFrame,
    column: str,
    order_col: str,
    ts_col: str,
    lag: int,
    group_col: str | None = None,
    min_acf: float | None = None,
    max_acf: float | None = None,
    min_count: int = 3,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ``x-seasonality`` (operators/seasonality.py lifted to
    event-time windows): the lag-``lag`` autocorrelation of ``column``
    ordered by ``order_col`` per (window × group) within bounds — the
    rhythm loss / stuck-sensor onset surfaces in the window where it
    started.  acf needs ORDERED pairs, which no mergeable per-row sum
    can carry across micro-batches, so this uses the funnel-collect
    shape: one NATIVE windowed aggregation gathers each group's
    in-window (order, value) structs sorted (state bounded by
    rows-per-group-per-window; series deliberately do not span windows
    — the batch operator over the settled table is the cross-window
    check), then the Pearson r of the series vs its lag-k shift is
    computed by pure post-aggregation array algebra (slice + zip_with +
    aggregate sums — append-legal, no Python state).  The pair list is
    STAGED as its own column first: six sum expressions re-deriving it
    inline would re-evaluate the zip per reference (the documented HOF
    staging pitfall).

    Semantics notes: within a window, order ties sort by value (the
    batch operator breaks ties by the run key — pass a unique
    ``order_col`` when comparing); NULL values participate as pair
    holes (pairwise-complete, like batch).  Windows with undefined acf
    (constant series) or fewer than ``min_count`` complete pairs pass
    (suppressed), like batch.

    Output: (window_start, group, acf, n, passed)."""
    if min_acf is None and max_acf is None:
        raise ValueError("stream_seasonality_verdicts needs min and/or max")
    k = int(lag)
    if k < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
           if group_col is not None else F.lit("<global>"))
    ev = F.struct(F.col(order_col).alias("o"),
                  F.col(column).cast("double").alias("v"))
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .where(F.col(order_col).isNotNull())
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 grp.alias("group"))
        .agg(F.sort_array(F.collect_list(ev)).alias("__evs"))
    )
    vals = F.transform(F.col("__evs"), lambda e: e["v"])
    staged = agg.withColumn("__vals", vals).withColumn(
        "__pairs",
        F.when(
            F.size(F.col("__vals")) > k,
            F.filter(
                F.zip_with(
                    F.slice(F.col("__vals"), k + 1,
                            F.size(F.col("__vals")) - k),
                    F.slice(F.col("__vals"), 1,
                            F.size(F.col("__vals")) - k),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b"))),
                lambda p: p["a"].isNotNull() & p["b"].isNotNull()),
        ).otherwise(F.expr("CAST(array() AS array<struct<a:double,b:double>>)")))

    def _sum(field_expr):
        return F.aggregate(F.col("__pairs"), F.lit(0.0),
                           lambda acc, p: acc + field_expr(p))

    n = F.size(F.col("__pairs")).cast("double")
    sx = _sum(lambda p: p["a"])
    sy = _sum(lambda p: p["b"])
    sxy = _sum(lambda p: p["a"] * p["b"])
    sxx = _sum(lambda p: p["a"] * p["a"])
    syy = _sum(lambda p: p["b"] * p["b"])
    # greatest(., 0) clamps float-noise-negative variances: their sqrt
    # is NaN, and NaN sorts LARGER than any double in Spark — it would
    # silently PASS a min bound (the stream_correlation lesson)
    denom = F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0))
                   * F.greatest(n * syy - sy * sy, F.lit(0.0)))
    r = F.try_divide(n * sxy - sx * sy, denom)
    passed = F.lit(True)
    if min_acf is not None:
        passed = passed & (r >= F.lit(float(min_acf)))
    if max_acf is not None:
        passed = passed & (r <= F.lit(float(max_acf)))
    passed = F.when(n < F.lit(float(int(min_count))), F.lit(True)) \
        .when(r.isNull(), F.lit(True)).otherwise(passed)
    return staged.select(
        F.col("__w").getField("start").alias("window_start"),
        "group",
        F.coalesce(r, F.lit(0.0)).cast("double").alias("acf"),
        n.cast("long").alias("n"),
        passed.alias("passed"))


def stream_index_collisions(
    sdf: DataFrame,
    index,
    key: str = "doc_id",
    check_id: str | None = None,
) -> DataFrame:
    """Streaming historical uniqueness (operators/unique_index.py lifted
    to ingest time): every streamed row whose value ALREADY EXISTS in a
    persisted :class:`UniqueIndex` is flagged as it arrives — the
    validation-on-ingest form of ``x-unique {"index": "@hist"}``
    (re-submitted documents, replayed ingest jobs, id-space collisions
    against the historical corpus).

    Scale shape: a STREAM-STATIC left-semi join — the static side is the
    index's catalog bucketed table, so Spark plans the same
    bucket-layout-aware join as the batch probe; no watermark and no
    state store (the "history" lives in the index files, not in
    streaming state — the only design whose memory does not grow with
    the historical value count). Stream-static joins are append-legal.

    Semantic pair with the batch operator (the level-shift convention):
    batch ``collision_violations`` reports each colliding VALUE once
    with its batch multiplicity; the stream emits one alert PER ROW
    (doc_id = the row key) as it arrives — per-value aggregation over an
    unbounded stream would need a window, and a collision alert should
    not wait for one. Parity on the value set is pytest-asserted.

    The index snapshot is taken when the static DataFrame is resolved:
    values ``extend()``-ed after query start become visible per the
    catalog's file-listing refresh semantics — restart the query (or
    ``REFRESH TABLE``) for a guaranteed pickup; a validated batch is
    normally extended BEFORE the next ingest window opens.
    """
    from jsonschema_valid_spark.operators.unique_index import UniqueIndex

    if not isinstance(index, UniqueIndex):
        raise ValueError(
            f"index must be a UniqueIndex, got {type(index).__name__}")
    col = index.column
    if col not in sdf.columns or key not in sdf.columns:
        raise ValueError(
            f"stream needs columns {col!r} and {key!r} (have {sdf.columns})")
    spark = sdf.sparkSession
    index._check_types(spark, sdf)  # same coercion-refusal rule as batch
    idx = index.index_df(spark).select(col)
    cid = check_id or f"properties/{col}/x-unique"
    hits = (sdf.where(F.col(col).isNotNull())
            .join(idx, col, "left_semi"))
    return hits.select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(cid).alias("check_id"),
        F.concat(F.lit("value="), F.col(col).cast("string"),
                 F.lit("; exists in index")).alias("observed"),
        F.lit("unique incl. index").alias("expected"),
    )


def stream_k_anonymity_alerts(
    sdf: DataFrame,
    quasi: list[str],
    ts_col: str,
    k: int | None = None,
    l: int | None = None,  # noqa: E741 — the paper's own name
    sensitive: str | None = None,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
    rsd: float = 0.02,
) -> DataFrame:
    """Streaming ``x-kAnonymity`` (operators/anonymity.py lifted to
    event-time windows): per-(window, quasi-cell) anonymity floors for
    pipelines that RELEASE data per window (hourly exports, daily
    dumps) — the release unit is the window, so each window must be
    anonymous on its own; a cell k-anonymous over the whole table can
    still be a singleton in the hour that actually ships.

    ONE native windowed aggregation (count + ``approx_count_distinct``
    of the sensitive column when ``l`` is declared — streaming
    aggregation needs a mergeable sketch, so the diversity floor is
    HLL-approximate here at relative error ``rsd`` (default 0.02 —
    matching the documented ~2% headroom advice); run the exact batch
    keyword over the settled table as the authority — the
    stream_distinct_ratio convention). Append on watermark close; no
    Python state.

    Output: (window_start, cell, n, d?, passed) — every cell enumerated,
    passing ones included (the per-partition verdict shape)."""
    if k is None and l is None:
        raise ValueError("stream_k_anonymity_alerts needs k and/or l")
    if l is not None and not sensitive:
        raise ValueError("l-diversity needs the sensitive column")
    if not quasi:
        raise ValueError("needs at least one quasi column")
    from jsonschema_valid_spark.operators.anonymity import cell_label

    aggs = [F.count(F.lit(1)).alias("n")]
    if l is not None:
        aggs.append(F.approx_count_distinct(sensitive, rsd).alias("d"))
    # group by the RAW quasi columns — grouping by the rendered label
    # would merge distinct cells whose renderings collide ('a/b','c' vs
    # 'a','b/c', or a literal 'NULL' string vs a real NULL), inflating a
    # singleton past the floor; the label is display-only, derived after
    # aggregation (the batch operator's rule)
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"),
                 *[F.col(c) for c in quasi])
        .agg(*aggs)
        .withColumn("cell", cell_label(quasi))
    )
    passed = F.lit(True)
    if k is not None:
        passed = passed & (F.col("n") >= int(k))
    if l is not None:
        passed = passed & (F.col("d") >= int(l))
    cols = [F.col("__w").getField("start").alias("window_start"),
            "cell", "n"]
    if l is not None:
        cols.append("d")
    return agg.select(*cols, passed.alias("passed"))


def stream_referential_violations(
    sdf: DataFrame,
    domain: DataFrame,
    column,
    key: str = "doc_id",
    domain_column=None,
    check_id: str | None = None,
) -> DataFrame:
    """Streaming ``x-referential`` — membership validated AT INGEST: every
    arriving row whose value (or key TUPLE, when ``column`` is a list —
    the wave-46 composite form) is absent from the domain becomes a
    violation row immediately, instead of waiting for the batch pass
    over the settled table.

    This is the SAME operator as batch (operators/referential.py): a
    broadcast left-anti join is stream-static-legal with no watermark
    and no state store — the domain lives in the broadcast, so memory is
    bounded by the dimension, not the stream. The wrapper exists to
    document the streaming contract: the domain snapshot is resolved at
    query start (the stream_index_collisions rule — restart or REFRESH
    to pick up later domain growth), and only exact mode applies (bloom
    is for domains too big to broadcast, which a per-batch rebuild would
    re-pay; run it over the settled table instead).
    """
    from jsonschema_valid_spark.operators.referential import (
        referential_violations,
    )

    if not sdf.isStreaming:
        raise ValueError("stream_referential_violations expects a "
                         "streaming DataFrame — use "
                         "referential_violations for batch")
    if not isinstance(domain, DataFrame) or domain.isStreaming:
        raise ValueError("the domain must be a STATIC DataFrame "
                         "(stream-stream membership needs a windowed "
                         "join — streaming/joins.py)")
    cid = check_id or (
        f"properties/{column}/x-referential"
        if isinstance(column, str) else "x-referential")
    return referential_violations(sdf, column, domain, cid, key=key,
                                  domain_column=domain_column)


def stream_coverage_verdicts(
    sdf: DataFrame,
    column: str,
    ts_col: str,
    domain,
    coverage_min: float,
    domain_column: str | None = None,
    window_duration: str = "1 minute",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming domain-side coverage — the twin of ``x-referential
    {"coverageMin"}`` (operators/referential.py domain_coverage), and the
    check whose failure mode is BORN streaming: "a source stopped
    arriving" is a per-window question ("did every region report in the
    last hour?"), not a settled-table one, where the silent slice stays
    diluted by history.

    Per event-time window: the fraction of DOMAIN values seen at least
    once among the window's (member) rows must be ≥ ``coverage_min``.
    Pure NATIVE windowed aggregation: rows are first filtered to domain
    members (broadcast semi-join for a DataFrame domain, an ``isin``
    filter for a literal — stream-static-legal, no state), then
    ``approx_count_distinct`` per window (HLL, mergeable across
    micro-batches — exact distinct is unavailable to streaming
    aggregation; the ~2% sketch error means τ needs headroom, the same
    delta ``stream_distinct_ratio_verdicts`` documents). |domain| is
    resolved ONCE at query start from the dimension-sized domain (the
    stream_referential_violations snapshot rule: restart to pick up
    domain growth).

    Output: (window_start, n_domain, n_seen, coverage, passed) — one
    verdict row per window as the watermark closes it; a window with
    ZERO member rows emits nothing (total absence is
    ``stream_freshness_alerts``' job — the same caveat as
    stream_rowcount_verdicts)."""
    from pyspark.sql import DataFrame as _DF

    if not sdf.isStreaming:
        raise ValueError("stream_coverage_verdicts expects a streaming "
                         "DataFrame — use domain_coverage for batch")
    if not 0 < float(coverage_min) <= 1:
        raise ValueError("coverage_min must be in (0, 1]")
    fact = sdf.where(F.col(column).isNotNull())
    if isinstance(domain, _DF):
        if domain.isStreaming:
            raise ValueError("the domain must be a STATIC DataFrame")
        dcol = domain_column or domain.columns[0]
        dom = (domain.select(F.col(dcol).alias(column))
               .where(F.col(column).isNotNull()).distinct())
        n_domain = dom.count()  # dimension-sized, once at query build
        members = fact.join(F.broadcast(dom), on=column, how="left_semi")
    else:
        values = list(dict.fromkeys(domain))
        if not values:
            raise ValueError("stream_coverage_verdicts: empty domain")
        n_domain = len(values)
        members = fact.where(F.col(column).isin(*values))
    agg = (
        members.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"))
        .agg(F.approx_count_distinct(F.col(column)).alias("n_seen"))
    )
    coverage = F.col("n_seen").cast("double") / F.lit(float(n_domain))
    return agg.select(
        F.col("__w").getField("start").alias("window_start"),
        F.lit(n_domain).cast("long").alias("n_domain"),
        F.col("n_seen").cast("long").alias("n_seen"),
        coverage.alias("coverage"),
        (coverage >= F.lit(float(coverage_min))).alias("passed"))


def stream_neardup_collisions(
    sdf: DataFrame,
    index,
    text_col: str,
    key: str = "doc_id",
    check_id: str | None = None,
    est_threshold: float = 0.7,
    dedup_pairs: bool = True,
) -> DataFrame:
    """Streaming historical NEAR-duplicate membership
    (operators/neardup_index.py lifted to ingest time): every streamed
    document whose estimated Jaccard against SOME already-ingested doc
    reaches ``est_threshold`` is flagged as it arrives — the
    validation-on-ingest form of ``x-nearDup {"index": "@hist"}``
    (re-crawled pages, lightly-edited resubmissions, template spam
    against the historical corpus).

    Scale shape: the document is shingled/signed/banded INLINE on the
    stream (pure codegen array expressions — the batch staging reused
    verbatim), then TWO stream-static joins against the index's catalog
    bucketed tables: band rows on ``bkey`` for candidates, signatures on
    the id for the agreement verify — both static sides read their
    clustering from the bucket layout, exactly like the batch probe. No
    watermark and no state store: history lives in the index files, the
    only design whose memory does not grow with the corpus.
    Stream-static joins are append-legal.

    Semantic pair with the batch operator (the stream_index_collisions
    convention): batch ``collision_violations`` reports each colliding
    batch doc once with its LEXICOGRAPHICALLY-SMALLEST matched
    historical doc; the stream emits one alert per (doc, matched
    historical doc) pair as it arrives — per-doc best-match aggregation
    over an unbounded stream would need a window, and a contamination
    alert should not wait for one. Parity on the flagged-doc set is
    pytest-asserted.

    The index snapshot is taken when the static DataFrames are resolved
    (the stream_index_collisions refresh rule applies verbatim)."""
    from jsonschema_valid_spark.operators.neardup_index import NearDupIndex

    if not isinstance(index, NearDupIndex):
        raise ValueError(
            f"index must be a NearDupIndex, got {type(index).__name__}")
    if text_col not in sdf.columns or key not in sdf.columns:
        raise ValueError(
            f"stream needs columns {text_col!r} and {key!r} "
            f"(have {sdf.columns})")
    spark = sdf.sparkSession
    cid = check_id or f"properties/{text_col}/x-nearDup"
    sigs = index._sig_frame(sdf, key, text_col)
    bands = index._band_frame(sigs)
    cat_bands = spark.table(index.bands_table)
    cand = (bands.alias("b")
            .join(cat_bands.alias("h"), "bkey")
            .where(F.col("b.id") != F.col("h.id"))
            .select(F.col("b.id").alias("doc_id"),
                    F.col("h.id").alias("hist_id")))
    if dedup_pairs:
        cand = cand.dropDuplicates(["doc_id", "hist_id"])
    cat_sigs = spark.table(index.sigs_table)
    est = (F.aggregate(
               F.zip_with(F.col("bsig"), F.col("hsig"),
                          lambda x, y: (x == y).cast("int")),
               F.lit(0), lambda acc, v: acc + v)
           / F.lit(float(index.num_perm)))
    return (cand
            .join(sigs.select(F.col("id").alias("doc_id"),
                              F.col("sig").alias("bsig")), "doc_id")
            .join(cat_sigs.select(F.col("id").alias("hist_id"),
                                  F.col("sig").alias("hsig")), "hist_id")
            .withColumn("__est", est)
            .where(F.col("__est") >= F.lit(float(est_threshold)))
            .select(
                F.col("doc_id"),
                F.lit(cid).alias("check_id"),
                F.concat(F.lit("neardup of "), F.col("hist_id"),
                         F.lit(", est="),
                         F.round(F.col("__est"), 6).cast("string"))
                .alias("observed"),
                F.lit(f"no near-duplicate of ingested history "
                      f"(est jaccard >= {est_threshold:g})")
                .alias("expected"),
            ))
