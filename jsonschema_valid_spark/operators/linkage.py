"""Record linkage / entity resolution: blocked candidate generation,
weighted field-similarity scoring, and match clustering.

The cross-ROW sibling of the dedup family: near-dup dedup asks "is this
TEXT a copy"; linkage asks "do these two RECORDS describe the same
entity" — a typo'd customer re-registered with a new id, the same
supplier loaded from two feeds, a user row duplicated with a reformatted
phone. ≙ reference semantics anchor: ``x-unique`` lifted from exact
value equality to approximate multi-field identity (the same lift
``x-nearDup`` makes for document text).

Scale shape (Fellegi-Sunter-style pipeline, relational throughout):

* **Blocking** — candidates come from equi-joins on one or more blocking
  keys (never an all-pairs join): pairs exist only within a block, and
  multi-key blocking (a list of key expressions) unions the per-key
  candidate sets and dedups (a, b) BEFORE scoring, the standard
  recall-repair for records that miss on one key but meet on another.
  Hot blocks are the skew risk — the ``max_block`` guard either refuses
  (``on_oversize="error"``) or drops oversize blocks with the loss made
  explicit (``on_oversize="skip"``; pair count in a block is quadratic,
  so one degenerate key value — empty string, NULL-ish placeholder —
  otherwise owns the whole job).
* **Scoring** — per-field similarity in [0, 1] as native JVM expressions
  (``levenshtein`` ratio, token-set Jaccard, null-safe exact), combined
  as a weight-normalized sum. Runs only on candidate pairs.
* **Clustering** — matched pairs feed the existing large-star/small-star
  :func:`~jsonschema_valid_spark.functions.dedup.connected_components`,
  so transitive matches (A~B, B~C) collapse to one entity id without an
  all-pairs closure.

Every stage is replayable in ANSI SQL (DuckDB ships ``levenshtein`` and
the list algebra), so the driver oracle checks the full pipeline
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _block_col(expr: str) -> F.Column:
    return F.expr(expr)


def link_candidates(
    df: DataFrame,
    key: str,
    block_on: str | list[str],
    carry: list[str],
    max_block: int = 100_000,
    on_oversize: str = "error",
) -> DataFrame:
    """Candidate pairs (a, b, <carry>_a, <carry>_b) from one self-equi-join
    per blocking key, deduped on (a, b) across keys before any scoring.

    ``block_on`` entries are SQL expressions (``"l_nationkey"``,
    ``"substr(name, 1, 4)"``). NULL block keys never pair (a NULL key is
    an absent key, not a shared one). ``carry`` columns ride the join so
    scoring needs no second fetch of the base table."""
    if on_oversize not in ("error", "skip"):
        raise ValueError(f"on_oversize must be 'error' or 'skip', "
                         f"got {on_oversize!r}")
    exprs = [block_on] if isinstance(block_on, str) else list(block_on)
    if not exprs:
        raise ValueError("block_on must name at least one blocking key")

    out = None
    for be in exprs:
        base = df.select(
            F.col(key).alias("__k"), _block_col(be).alias("__blk"),
            *[F.col(c).alias(f"__f_{c}") for c in carry],
        ).where(F.col("__blk").isNotNull())

        counts = base.groupBy("__blk").agg(F.count(F.lit(1)).alias("__n"))
        if on_oversize == "error":
            mx = counts.agg(F.max("__n").alias("m")).first()
            if mx is not None and mx["m"] is not None \
                    and int(mx["m"]) > int(max_block):
                raise ValueError(
                    f"blocking key {be!r} has a block of {int(mx['m'])} "
                    f"rows (> max_block={max_block}): the pair join is "
                    "quadratic per block — refine the key, or pass "
                    "on_oversize='skip' to drop oversize blocks "
                    "explicitly")
        else:
            base = (base.join(F.broadcast(
                counts.where(F.col("__n") <= int(max_block))), on="__blk"))

        left = base.select(
            F.col("__blk"), F.col("__k").alias("a"),
            *[F.col(f"__f_{c}").alias(f"{c}_a") for c in carry])
        right = base.select(
            F.col("__blk"), F.col("__k").alias("b"),
            *[F.col(f"__f_{c}").alias(f"{c}_b") for c in carry])
        cand = (left.join(right, on="__blk")
                .where(F.col("a") < F.col("b")).drop("__blk"))
        out = cand if out is None else out.unionByName(cand)
    # one score per pair regardless of how many blocking keys it met;
    # carried values are key-determined, so any surviving row is identical
    return out.dropDuplicates(["a", "b"])


def _field_score(c_a: F.Column, c_b: F.Column, method: str) -> F.Column:
    """Similarity in [0, 1]; either side NULL scores 0 except null-safe
    exact (both NULL = same entity evidence is void — score 0 there too,
    by the 'absent is not evidence' rule)."""
    if method == "exact":
        return F.when(c_a.isNotNull() & c_b.isNotNull()
                      & (c_a == c_b), F.lit(1.0)).otherwise(F.lit(0.0))
    if method == "levenshtein":
        sim = F.lit(1.0) - (
            F.levenshtein(c_a, c_b).cast("double")
            / F.greatest(F.length(c_a), F.length(c_b), F.lit(1))
            .cast("double"))
        return F.when(c_a.isNull() | c_b.isNull(), F.lit(0.0)).otherwise(sim)
    if method == "jaccard":
        def toks(c):
            return F.array_distinct(
                F.split(F.lower(c), r"\s+"))
        inter = F.size(F.array_intersect(toks(c_a), toks(c_b)))
        union = F.size(F.array_union(toks(c_a), toks(c_b)))
        sim = F.when(union > 0,
                     inter.cast("double") / union.cast("double")) \
            .otherwise(F.lit(0.0))
        return F.when(c_a.isNull() | c_b.isNull(), F.lit(0.0)).otherwise(sim)
    raise ValueError(f"unknown field method {method!r} "
                     "(exact | levenshtein | jaccard)")


def link_records(
    df: DataFrame,
    key: str,
    fields: list[dict],
    block_on: str | list[str],
    threshold: float,
    max_block: int = 100_000,
    on_oversize: str = "error",
) -> DataFrame:
    """Matched pairs ``(a, b, score)`` with ``score`` the weight-normalized
    field-similarity sum, kept when ``score >= threshold``.

    ``fields``: ``[{"column": c, "method": "exact" | "levenshtein" |
    "jaccard", "weight": w}, ...]`` — weights normalize by their sum, so
    only ratios matter. ``score`` is emitted rounded to 6 decimals for
    cross-engine string/hash stability; the threshold filter uses the
    unrounded value (pick thresholds with margin, as any float gate)."""
    if not fields:
        raise ValueError("fields must name at least one similarity field")
    for f in fields:
        if "column" not in f or "method" not in f:
            raise ValueError("each field needs 'column' and 'method'")
    wsum = float(sum(float(f.get("weight", 1.0)) for f in fields))
    if wsum <= 0:
        raise ValueError("field weights must sum > 0")

    carry = sorted({f["column"] for f in fields})
    cand = link_candidates(df, key, block_on, carry,
                           max_block=max_block, on_oversize=on_oversize)
    score = None
    for f in fields:
        c = f["column"]
        s = _field_score(F.col(f"{c}_a"), F.col(f"{c}_b"), f["method"]) \
            * F.lit(float(f.get("weight", 1.0)) / wsum)
        score = s if score is None else (score + s)
    return (cand.withColumn("__score", score)
            .where(F.col("__score") >= float(threshold))
            .select("a", "b", F.round("__score", 6).alias("score")))


def linkage_violations(df: DataFrame, column: str, check_id: str,
                       key: str = "doc_id",
                       params: dict | None = None) -> DataFrame:
    """``x-linkage`` engine adapter: approximate-identity membership as a
    first-class VALIDATION check — every non-survivor of an entity
    cluster becomes a violation (doc_id, check_id, observed="entity of
    <survivor>", expected), exactly how ``x-unique`` reports exact
    duplicates and ``x-nearDup`` reports text near-duplicates; this is
    the multi-FIELD record lift (same person re-registered under a new
    id). ``column`` anchors the check's schema path and defaults to the
    first scoring field. Params: ``blockOn`` (key expression or list),
    ``fields`` (see :func:`link_records`), ``threshold``, ``maxBlock``,
    ``onOversize``. Survivors follow the engine's deterministic min-key
    rule via the shared connected components."""
    p = params or {}
    fields = p.get("fields") or [{"column": column, "method": "levenshtein",
                                  "weight": 1.0}]
    thr = float(p.get("threshold", 0.9))
    pairs = link_records(
        df, key, fields, block_on=p["blockOn"], threshold=thr,
        max_block=int(p.get("maxBlock", 100_000)),
        on_oversize=p.get("onOversize", "error"))
    from jsonschema_valid_spark.functions.dedup import neardup_survivors

    marked = neardup_survivors(df, key, pairs.select("a", "b"))
    return marked.where(~F.col("is_survivor")).select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("entity of "),
                 F.col("cluster_id").cast("string")).alias("observed"),
        F.lit(f"unique entity (linkage score < {thr:g})").alias("expected"),
    )


_MERGE_RULES = ("latest", "earliest", "most_frequent", "min", "max", "sum")


def merge_clusters(
    df: DataFrame,
    key: str,
    clusters: DataFrame,
    rules: dict[str, str],
    order_by: str | None = None,
) -> DataFrame:
    """Golden-record construction: collapse each entity cluster to ONE
    canonical record by per-field survivorship rules — the step after
    :func:`link_clusters` answers "which records are the same entity",
    this answers "what does the merged entity look like".

    ``rules`` maps column -> rule:

    - ``latest`` / ``earliest``: the column value from the member with
      the max/min ``order_by`` (ties broken by ``key``; members where
      the column is NULL never win — survivorship wants the newest
      NON-NULL value, not a newer NULL).
    - ``most_frequent``: the modal value (NULLs excluded), ties broken
      by the larger value — deterministic, unlike a bare ``mode()``.
    - ``min`` / ``max`` / ``sum``: plain aggregates.

    Output: one row per ``cluster_id`` with ``n_members`` and the merged
    columns.  Scale contract: cluster assignment is one equi-join on
    ``key``; all rules except ``most_frequent`` ride ONE
    map-side-combined groupBy(cluster_id) — ``latest``/``earliest`` are
    ``max_by``/``min_by`` over a NULL-guarded (order, key) struct, which
    is a mergeable aggregate, not a window.  Each ``most_frequent``
    column adds one (cluster_id, value) count pass joined back on
    #clusters rows — documented extra shuffle, never a window over the
    fact rows."""
    for col, rule in rules.items():
        if rule not in _MERGE_RULES:
            raise ValueError(f"unknown merge rule {rule!r} for {col!r} "
                             f"(choose from {_MERGE_RULES})")
        if rule in ("latest", "earliest") and order_by is None:
            raise ValueError(f"rule {rule!r} for {col!r} needs order_by")
    joined = df.join(clusters.withColumnRenamed("id", key), on=key)
    aggs = [F.count(F.lit(1)).alias("n_members")]
    freq_cols = []
    for col, rule in rules.items():
        c = F.col(col)
        if rule in ("min", "max", "sum"):
            aggs.append(getattr(F, rule)(c).alias(col))
        elif rule in ("latest", "earliest"):
            ord_key = F.when(
                c.isNotNull(), F.struct(F.col(order_by), F.col(key)))
            fn = F.max_by if rule == "latest" else F.min_by
            aggs.append(fn(c, ord_key).alias(col))
        else:
            freq_cols.append(col)
    out = joined.groupBy("cluster_id").agg(*aggs)
    for col in freq_cols:
        cnt = (joined.where(F.col(col).isNotNull())
               .groupBy("cluster_id", col)
               .agg(F.count(F.lit(1)).alias("__c")))
        top = cnt.groupBy("cluster_id").agg(
            F.max_by(F.col(col), F.struct(F.col("__c"), F.col(col)))
            .alias(col))
        out = out.join(top, on="cluster_id", how="left")
    return out


def link_clusters(df: DataFrame, key: str, pairs: DataFrame) -> DataFrame:
    """Entity assignment ``(id, cluster_id)`` for EVERY input record:
    matched components collapse to their minimum key (the same survivor
    rule as the dedup family); unmatched records are their own entity."""
    from jsonschema_valid_spark.functions.dedup import connected_components

    comp = connected_components(pairs, "a", "b")
    ids = df.select(F.col(key).alias("id"))
    return (ids.join(comp, on="id", how="left")
            .select("id", F.coalesce(F.col("cluster_id"),
                                     F.col("id")).alias("cluster_id")))
