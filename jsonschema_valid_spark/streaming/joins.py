"""Stream-stream temporal joins: the streaming twin of
``operators/temporal.py interval_point_join``.

Spark's native stream-stream join is the one join that needs BOTH
watermarks and an event-time range condition to bound its state — the
canonical click→purchase-window attribution on live feeds.  Without the
range condition the state store would keep every row forever (Spark
refuses append-mode stream-stream joins that cannot expire state); with
it, each side's buffered rows expire as soon as the other side's
watermark passes the end of their join window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_window_attribution(
    points: DataFrame,
    windows: DataFrame,
    on: str,
    point_ts: str,
    window_ts: str,
    within_seconds: float,
    watermark: str = "10 minutes",
    prefix: str = "w_",
) -> DataFrame:
    """Attribute each point event to every window event of the same
    ``on`` key whose ``[window_ts, window_ts + within_seconds)``
    interval contains it — both sides UNBOUNDED STREAMS.

    The two column names must differ (rename upstream); output = all
    point columns + ``{prefix}``-prefixed window columns.  Semantics ==
    the batch ``interval_point_join`` on the full histories (asserted
    in tests); state is bounded by the watermark + range condition
    (points buffer until the window side's watermark passes ts, window
    rows until the point side's watermark passes ts + within).
    """
    if point_ts == window_ts:
        raise ValueError("point_ts and window_ts must be distinct "
                         "column names (rename one side upstream)")
    us = int(round(float(within_seconds) * 1_000_000))
    if us <= 0:
        raise ValueError("within_seconds must be positive")
    p = points.withWatermark(point_ts, watermark).alias("__p")
    w = (windows.withWatermark(window_ts, watermark)
         .select(F.col(on).alias("__wk"),
                 F.col(window_ts),
                 *[F.col(c).alias(f"{prefix}{c}") for c in windows.columns
                   if c not in (on, window_ts)])
         .alias("__w"))
    pm = F.unix_micros(F.col(f"__p.{point_ts}").cast("timestamp"))
    wm_ = F.unix_micros(F.col(f"__w.{window_ts}").cast("timestamp"))
    cond = ((F.col(f"__p.{on}") == F.col("__w.__wk"))
            & (pm >= wm_) & (pm < wm_ + F.lit(us)))
    out_cols = [F.col(f"__p.{c}") for c in points.columns]
    out_cols.append(F.col(f"__w.{window_ts}")
                    .alias(f"{prefix}{window_ts}"))
    out_cols += [F.col(f"__w.{prefix}{c}") for c in windows.columns
                 if c not in (on, window_ts)]
    return p.join(w, cond, "inner").select(*out_cols)
