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
    label = F.concat_ws(
        "/", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
               for c in quasi])

    out = []
    if k is not None:
        out.append(cells.where(F.col("__n") < int(k)).select(
            label.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(F.lit("count="), F.col("__n").cast("string"))
            .alias("observed"),
            F.lit(f"group size >= {int(k)}").alias("expected"),
        ))
    if l is not None:
        out.append(cells.where(F.col("__d") < int(l)).select(
            label.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(F.lit("distinct="), F.col("__d").cast("string"),
                     F.lit(" (count="), F.col("__n").cast("string"),
                     F.lit(")")).alias("observed"),
            F.lit(f"sensitive diversity >= {int(l)}").alias("expected"),
        ))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
