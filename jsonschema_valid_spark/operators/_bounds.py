"""Shared min/max bounds algebra for the statistical keyword family
(x-distinctRatio, x-trend, x-compliance): one place for the
out-of-bounds predicate and the violated-threshold selection, so the
violations and perGroup-verdict forms of each keyword cannot diverge."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def out_of_bounds(metric: Column, lo: float | None,
                  hi: float | None) -> Column:
    """True when ``metric`` falls outside [lo, hi] (NULL metric ⇒ NULL,
    which every caller suppresses)."""
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (metric < F.lit(float(lo)))
    if hi is not None:
        bad = bad | (metric > F.lit(float(hi)))
    return bad


def violated_threshold(metric: Column, lo: float | None,
                       hi: float | None) -> Column:
    """The bound a failing metric actually crossed (verdict
    ``threshold`` column): the max bound when the metric exceeds it,
    else the min bound; passing rows report the min bound when declared
    (the tighter 'floor' convention) else the max."""
    if lo is not None and hi is not None:
        return F.when(metric > F.lit(float(hi)), F.lit(float(hi))) \
            .otherwise(F.lit(float(lo)))
    return F.lit(float(lo if lo is not None else hi))
