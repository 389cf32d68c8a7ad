"""Parametric distribution checks (``x-distribution``): goodness-of-fit
of a numeric column against a CLOSED-FORM law — uniform / exponential /
normal / benford — with no trusted snapshot required.

The baseline-free sibling of ``x-drift``: drift compares against an
OBSERVED baseline histogram (a trusted earlier load); this compares
against a distribution the data is SUPPOSED to follow by construction —
hash-gate outputs and salted keys must be uniform (a biased sampler or a
broken hash shows up here first), inter-arrival gaps exponential under a
Poisson feed, standardized residuals normal. ≙ reference semantics
anchor: ``x-drift``'s statistics with the baseline synthesized from the
law instead of measured.

Execution shape: the expected per-bucket MASS is integrated from the CDF
ON THE DRIVER (pure Python math — any family works without SQL-side
special functions) and scaled to integer pseudo-counts, then the check IS
the existing drift machinery: one map-side-combined histogram aggregate
over the fact table, statistics over #buckets rows, PSI/KS/chi2
thresholds. Because the synthesized baseline is a literal dict, the
driver oracle replays the whole check with the baseline inlined as
VALUES — fully value-checkable.

Binned-KS caveat (same as x-drift): the statistic is evaluated at bucket
boundaries, so it understates the true KS by at most one bucket's
probability mass — size ``bucketWidth`` accordingly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

_SCALE = 1_000_000_000  # integer pseudo-count resolution per baseline


def _uniform_cdf(a: float, b: float):
    span = b - a

    def cdf(x: float) -> float:
        if x <= a:
            return 0.0
        if x >= b:
            return 1.0
        return (x - a) / span

    return cdf, a, b


def _exponential_cdf(rate: float, shift: float):
    def cdf(x: float) -> float:
        if x <= shift:
            return 0.0
        return 1.0 - math.exp(-rate * (x - shift))

    # cover all but 1e-9 of the tail; the remainder folds into the last
    # bucket so the masses still sum to 1
    hi = shift + (-math.log(1e-9)) / rate
    return cdf, shift, hi


def _normal_cdf(mean: float, std: float):
    def cdf(x: float) -> float:
        return 0.5 * (1.0 + math.erf((x - mean) / (std * math.sqrt(2.0))))

    return cdf, mean - 6.0 * std, mean + 6.0 * std


def parametric_baseline(family: str, params: dict,
                        bucket_width: float) -> dict[int, int]:
    """Integer pseudo-count histogram of the law, bucketed exactly like
    :func:`~jsonschema_valid_spark.operators.drift.histogram` (bucket =
    floor(x / width)). Tail mass beyond the enumerated support folds into
    the edge buckets, so the masses always sum to ~_SCALE."""
    if family == "benford":
        return benford_baseline()
    w = float(bucket_width)
    if w <= 0:
        raise ValueError(f"bucketWidth must be > 0, got {bucket_width}")
    if family == "uniform":
        cdf, lo, hi = _uniform_cdf(float(params["min"]), float(params["max"]))
        if not float(params["min"]) < float(params["max"]):
            raise ValueError("uniform needs min < max")
    elif family == "exponential":
        rate = float(params["rate"])
        if rate <= 0:
            raise ValueError(f"exponential rate must be > 0, got {rate}")
        cdf, lo, hi = _exponential_cdf(rate, float(params.get("shift", 0.0)))
    elif family == "normal":
        std = float(params["std"])
        if std <= 0:
            raise ValueError(f"normal std must be > 0, got {std}")
        cdf, lo, hi = _normal_cdf(float(params["mean"]), std)
    else:
        raise ValueError(f"unknown family {family!r} "
                         "(uniform | exponential | normal | benford)")

    b_lo = math.floor(lo / w)
    b_hi = math.floor(hi / w)
    if b_hi - b_lo > 100_000:
        raise ValueError(
            f"law spans {b_hi - b_lo} buckets at bucketWidth={w} — "
            "widen the buckets (the statistics run over #buckets rows)")
    out: dict[int, int] = {}
    for b in range(b_lo, b_hi + 1):
        lo_edge = b * w
        hi_edge = (b + 1) * w
        mass = cdf(hi_edge) - cdf(lo_edge)
        if b == b_lo:
            mass += cdf(lo_edge)          # left tail folds in
        if b == b_hi:
            mass += 1.0 - cdf(hi_edge)    # right tail folds in
        c = int(round(mass * _SCALE))
        if c > 0:
            out[b] = c
    return out


def benford_baseline() -> dict[int, int]:
    """Benford's law as an integer pseudo-count histogram over buckets
    1..9: P(first significant digit = d) = log10(1 + 1/d).  The
    data-forensics law: naturally-grown multiplicative quantities
    (transaction amounts, populations, file sizes) follow it, while
    fabricated, truncated, or unit-capped data does not — a
    goodness-of-fit check against it is the classic generated-data /
    tampering detector that no range or drift check can express."""
    return {d: int(round(math.log10(1.0 + 1.0 / d) * _SCALE))
            for d in range(1, 10)}


def first_digit_histogram(df: DataFrame, column: str) -> DataFrame:
    """``(bucket, count)`` over the FIRST SIGNIFICANT DIGIT (1..9) of
    ``|column|``.  The digit is extracted from the decimal(38,10) string
    rendering (first char in [1-9]) — pure string algebra, no
    ``log10``/``pow`` floats whose last-ulp libm differences could
    bucket boundary values differently across engines; the oracle
    replays it with the same regexp.  Zero, NULL, |x| < 1e-10, and
    values beyond decimal(38,10) (try_cast NULL) carry no first digit
    and are excluded.  Same one-shuffle #buckets-row plan as
    :func:`~jsonschema_valid_spark.operators.drift.histogram`."""
    from pyspark.sql import functions as F

    return (df.select(first_digit_expr(column).alias("bucket"))
            .where(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("count")))


def first_digit_expr(column: str):
    """First-significant-digit Column (long 1..9, NULL when undefined) —
    the cross-engine-exact string extraction shared by the batch
    histogram and the streaming ingestion projection."""
    from pyspark.sql import functions as F

    return F.expr(
        "try_cast(regexp_extract("
        f"cast(try_cast(abs(`{column}`) as decimal(38,10)) as string), "
        "'[1-9]', 0) as long)")


def distribution_verdict_dfs(df: DataFrame, column: str, check_id: str,
                             params: dict, spark) -> list[DataFrame]:
    """x-distribution → verdict DFs: synthesize the law's baseline
    histogram, then run the shared drift statistic loop (all six
    thresholds — buckets are fixed-width here, so emdMax is valid too)
    over ONE observed-histogram aggregate."""
    from jsonschema_valid_spark.operators.drift import (
        _stat_verdict_dfs,
        histogram,
    )

    if params["family"] == "benford":
        baseline = benford_baseline()
        hist = first_digit_histogram(df, column)
        width = 1.0
    else:
        width = float(params.get("bucketWidth", 1.0))
        baseline = parametric_baseline(params["family"],
                                       params.get("params", params), width)
        hist = histogram(df, column, width)
    return _stat_verdict_dfs(hist, baseline, check_id, params, spark,
                             width=width)
