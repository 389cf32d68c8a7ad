"""Mergeable t-digest quantile sketch (Dunning & Ertl, arXiv:1902.04023).

The north-star contract names per-partition stats "via groupBy(...).agg
with approx_count_distinct and t-digest quantile sketches". The engine's
default quantile path stays ``percentile_approx`` (a JVM-side sketch inside
the fused aggregate — the fast path); this module adds the REAL mergeable
t-digest as an opt-in backend (``x-quantile: {"backend": "tdigest"}``) with
the two-phase shape a 10^12-row table needs:

* **phase 1 — no shuffle**: ``mapInPandas`` over the fact table builds one
  digest per (Spark partition × group) from Arrow batches. Raw values never
  leave their partition; per-batch re-compression keeps state at
  O(delta + batch) regardless of partition size.
* **phase 2 — digests only shuffle**: ``groupBy(group).applyInPandas``
  merges the ≤ delta-centroid digests and evaluates quantiles. The shuffle
  volume is #partitions × delta centroids — bytes, not rows.

Accuracy contract: while a group's total point count stays ≤ the scale
bound (singleton regime), the digest is EXACT and the quantile rule equals
``quantile_cont``/``np.quantile(linear)`` — the driver oracle
(``agg_tdigest_quantile``) runs in that regime so DuckDB replays it
value-for-value; the compressed regime's error bound is pytest-asserted
against exact quantiles (tests/test_tdigest.py).

Arrow-batched throughout (mapInPandas / applyInPandas) — no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_GLOBAL = "<global>"
# NULL group labels survive the pandas round-trip as this sentinel and are
# restored to NULL on output (str(None) would silently become "None")
_NULL_SENTINEL = "\x00<null>"


def _k(q: float, delta: float) -> float:
    """k1 scale function: k(q) = (δ/2π)·asin(2q−1) — centroid weight
    budget shrinks toward the tails, preserving tail-quantile accuracy."""
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _compress(means: np.ndarray, weights: np.ndarray, delta: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """One merge pass over mean-sorted centroids: greedily absorb the next
    centroid while the combined k-span stays ≤ 1."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    qleft = 0.0
    cur_m, cur_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q0 = qleft / total
        q2 = (qleft + cur_w + w) / total
        if _k(q2, delta) - _k(q0, delta) <= 1.0:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            qleft += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _merge(means: np.ndarray, weights: np.ndarray, delta: int
           ) -> tuple[np.ndarray, np.ndarray]:
    """Sort by mean + compress — the single primitive for both building
    (weights all 1) and digest-of-digests merging."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    return _compress(means[order], weights[order], delta)


def tdigest_quantile_value(means: np.ndarray, weights: np.ndarray,
                           q: float) -> float:
    """Quantile estimate from a digest.

    Singleton regime (every centroid weight 1 — the digest IS the sorted
    sample): linear interpolation at rank q·(N−1), bit-equal to
    ``quantile_cont`` / ``np.quantile(..., 'linear')``. Compressed regime:
    standard centroid-midpoint interpolation (cumulative weight at a
    centroid's midpoint, clamped to the extreme means)."""
    if means.size == 0:
        return float("nan")
    if means.size == 1:
        return float(means[0])
    if np.all(weights == 1.0):
        return float(np.quantile(means, q, method="linear"))
    cum = np.cumsum(weights) - weights / 2.0
    t = q * float(weights.sum())
    if t <= cum[0]:
        return float(means[0])
    if t >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, t))
    frac = (t - cum[i - 1]) / (cum[i] - cum[i - 1])
    return float(means[i - 1] + frac * (means[i] - means[i - 1]))


def _ensure_worker_pickling() -> None:
    """Executors may lack this package on sys.path (a bare session driving
    the library without ``spark-submit --py-files``); registering the
    module for by-value pickling makes the UDF closures self-contained, so
    the digest math ships inside the serialized function instead of
    requiring a worker-side import."""
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # vendored cloudpickle without the API → --py-files path


def partition_digests(df: DataFrame, value_col: str,
                      group_col: str | None = None,
                      delta: int = 100) -> DataFrame:
    """Phase 1: one digest per (Spark partition × group), built from Arrow
    batches with per-batch re-compression — no shuffle, bounded state.
    Returns (grp: string, means: array<double>, weights: array<double>)."""
    _ensure_worker_pickling()
    grp = (F.coalesce(F.col(group_col).cast("string"),
                      F.lit(_NULL_SENTINEL)) if group_col
           else F.lit(_GLOBAL))
    src = df.select(grp.alias("grp"), F.col(value_col).cast("double")
                    .alias("val"))

    def build(batches):
        state: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            for g, sub in pdf.groupby("grp", dropna=False):
                vals = sub["val"].to_numpy(dtype=float)
                vals = vals[~np.isnan(vals)]
                if vals.size == 0:
                    # the GROUP must still surface (review find: an
                    # all-NULL partition previously vanished instead of
                    # emitting the documented passing NaN verdict) —
                    # record an empty digest unless values arrive later
                    state.setdefault(str(g), (np.empty(0), np.empty(0)))
                    continue
                m0, w0 = state.get(str(g), (np.empty(0), np.empty(0)))
                state[str(g)] = _merge(
                    np.concatenate([m0, vals]),
                    np.concatenate([w0, np.ones(vals.size)]), delta)
        if state:
            yield pd.DataFrame({
                "grp": list(state),
                "means": [m.tolist() for m, _ in state.values()],
                "weights": [w.tolist() for _, w in state.values()],
            })

    return src.mapInPandas(
        build, "grp string, means array<double>, weights array<double>")


def tree_merge_digests(digests: DataFrame, delta: int = 100,
                       fanin: int = 64) -> DataFrame:
    """Intermediate digest-of-digests merge keyed (grp, salt): caps any
    single merge group at ~#partitions/fanin rows. At 10^6 input
    partitions the flat phase-2 would funnel 10^6 digest rows (~GBs) of a
    hot group into ONE pandas group; one tree level bounds every group to
    fanin rows at the final merge. Associativity is exact for digests
    built in the singleton regime and within the documented rank-error
    bound otherwise (tests/test_tdigest.py merge properties)."""
    _ensure_worker_pickling()
    salted = digests.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("means").cast("string")),
                         F.lit(int(fanin))))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _merge(
            np.concatenate([np.asarray(x) for x in pdf["means"]]),
            np.concatenate([np.asarray(x) for x in pdf["weights"]]), delta)
        return pd.DataFrame({"grp": [pdf["grp"].iloc[0]],
                             "means": [m.tolist()],
                             "weights": [w.tolist()]})

    return salted.groupBy("grp", "__salt").applyInPandas(
        merge_group,
        "grp string, means array<double>, weights array<double>")


def tdigest_quantiles(df: DataFrame, value_col: str, qs: list[float],
                      group_col: str | None = None,
                      delta: int = 100,
                      tree_fanin: int | None = None) -> DataFrame:
    """Two-phase t-digest quantiles per group: (grp, q, value) rows.
    Only digests cross the wire in phase 2 (#partitions × delta centroids
    per group); NULL/NaN values are dropped like every aggregate check.
    ``tree_fanin``: insert a :func:`tree_merge_digests` level when the
    input partition count is large enough that a hot group's digest rows
    would overwhelm one final merge group (rule of thumb: partitions >
    ~10·fanin)."""
    _ensure_worker_pickling()
    qs = [float(q) for q in qs]
    digests = partition_digests(df, value_col, group_col, delta)
    if tree_fanin:
        digests = tree_merge_digests(digests, delta, tree_fanin)

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(m) for m in pdf["means"]])
        weights = np.concatenate([np.asarray(w) for w in pdf["weights"]])
        m, w = _merge(means, weights, delta)
        g = pdf["grp"].iloc[0]
        return pd.DataFrame({
            "grp": [None if g == _NULL_SENTINEL else g] * len(qs),
            "q": qs,
            "value": [tdigest_quantile_value(m, w, q) for q in qs],
        })

    return digests.groupBy("grp").applyInPandas(
        finish, "grp string, q double, value double")


def tdigest_quantile_verdicts(df: DataFrame, column: str, check_id: str,
                              params: dict,
                              partition_by: str | None = None) -> DataFrame:
    """x-quantile {'backend': 'tdigest'} → per-partition verdict rows
    (partition_id, check_id, passed, metric_value, threshold) matching the
    fused-aggregate verdict contract; null-tolerant (an empty group's NaN
    estimate passes — presence is required/x-nullRate's job)."""
    q = float(params["q"])
    delta = int(params.get("delta", 100))
    lo, hi = params.get("min"), params.get("max")
    fanin = params.get("treeFanin")
    td = tdigest_quantiles(df, column, [q], group_col=partition_by,
                           delta=delta,
                           tree_fanin=int(fanin) if fanin else None)
    passed = F.lit(True)
    if lo is not None:
        passed = passed & (F.col("value") >= float(lo))
    if hi is not None:
        passed = passed & (F.col("value") <= float(hi))
    thr = float(hi if hi is not None else (lo if lo is not None else 0.0))
    return td.select(
        F.col("grp").alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        F.when(F.isnan(F.col("value")), F.lit(True))
        .otherwise(F.coalesce(passed, F.lit(True))).alias("passed"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("metric_value"),
        F.lit(thr).cast("double").alias("threshold"),
    )
