"""Functional-dependency validation: a determinant column must map to
exactly one value of its dependent column(s) (``x-functionalDependency``).

The dataset-scope lift of the reference's ``dependencies`` keyword
(validators.rs property/schema dependencies): there, the presence of one
KEY inside a single row constrains the same row; here, the VALUE of one
column constrains every OTHER ROW sharing it — "all lineitems of an order
ship the same way", "one customer key ⇒ one nation", "a fingerprint
determines its text". A violated FD is how denormalized feeds drift:
every individual row is valid, the contradiction only exists between rows.

Scale contract (10^12 rows): one map-side-combined aggregate on the
determinant (count-distinct + min/max of a canonical dependent rendering);
everything downstream operates on #determinant-values rows. No joins, no
row data past the partial aggregate, no self-join (the naive pairwise
contradiction check is a row-grain self-join — strictly worse).

Dependent values are canonicalised to ONE string — each column
``coalesce(CAST(x AS STRING), '<null>')``, joined with ``'|'`` — so NULL
counts as a distinct dependent value (a NULL nation for a customer whose
other rows say 'FRANCE' IS a contradiction) and so the distinct/min/max
math replays identically in any ANSI engine. Determinant NULL is its own
group, doc_id "<null>".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def functional_dependency_violations(
    df: DataFrame,
    column,
    check_id: str,
    determines: list[str],
) -> DataFrame:
    """``x-functionalDependency`` execution: determinant values mapped to
    more than one distinct dependent tuple, as engine violation rows
    (doc_id=determinant value, check_id, observed, expected).

    ``column`` may be a LIST for a composite determinant — "(store,
    sku) determines price" where neither column alone does. The group
    key is the RAW columns, never a rendered concatenation (rendering
    collisions would merge distinct determinants and hide
    contradictions — the cell-grouping rule); the label is derived
    after aggregation.

    observed = ``n_distinct=<k>,min=<tuple>,max=<tuple>`` — the count plus
    the lexicographic extremes of the contradicting dependent renderings,
    a bounded witness no matter how many rows the group has.
    """
    if not determines:
        raise ValueError("x-functionalDependency needs at least one "
                         "dependent column")
    cols = [column] if isinstance(column, str) else list(column)
    overlap = set(cols) & set(determines)
    if overlap:
        raise ValueError(
            f"determinant and dependent columns overlap: {sorted(overlap)} "
            "— a column trivially determines itself")
    dep = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
          for c in determines],
    )
    dets = [F.col(c).alias(f"__det_{i}") for i, c in enumerate(cols)]
    agg = (
        df.select(*dets, dep.alias("__dep"))
        .groupBy(*[f"__det_{i}" for i in range(len(cols))])
        .agg(
            F.countDistinct("__dep").alias("__k"),
            F.min("__dep").alias("__lo"),
            F.max("__dep").alias("__hi"),
        )
    )
    label = F.concat_ws(
        "|", *[F.coalesce(F.col(f"__det_{i}").cast("string"),
                          F.lit("<null>")) for i in range(len(cols))])
    exp_msg = f"{', '.join(cols)} determines ({', '.join(determines)})"
    return (
        agg.where(F.col("__k") > 1)
        .select(
            label.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("n_distinct="), F.col("__k").cast("string"),
                F.lit(",min="), F.col("__lo"),
                F.lit(",max="), F.col("__hi"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )
