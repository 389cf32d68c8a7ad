"""Sequence packing — assign variable-length tokenized sequences to
fixed-capacity token bins (the sample-packing step that turns a validated
corpus into dense training batches).

Optimal bin packing is NP-hard and inherently sequential; the scalable
scheme here is deterministic concatenate-and-chunk (the GPT-style packer):
within each partition (source, shard, …) sequences are ordered
deterministically and laid head-to-tail into one token stream; ``bin_id``/
``bin_offset`` are the ``capacity``-sized block and offset where each
sequence STARTS (``start = cumsum − n_tok``). Each partition's layout is
one window (sort + running sum) — a single shuffle keyed by the partition
column, no driver state, no Python. Sequences longer than ``capacity``
are flagged ``oversize``.

Unlike greedy best-fit this is fully deterministic and embarrassingly
parallel across partitions — the property that matters at 10¹²
sequences; the window's SQL twin (SUM() OVER) makes it oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(df: DataFrame, key: str, n_tok_col: str, capacity: int,
                   partition_col: str | None = None) -> DataFrame:
    """Add ``bin_id`` (0-based within partition), ``bin_offset`` (token
    start inside the bin) and ``oversize`` (n_tok > capacity) columns.

    Ordering inside a partition is (n_tok DESC, key) — descending lengths
    pack slightly denser under the running-sum cut and make the layout
    reproducible run-to-run. One window = one shuffle keyed by
    ``partition_col`` (or a single global window when None — only for
    fixtures; always pass a partition column at scale)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    part = [partition_col] if partition_col else []
    w = (Window.partitionBy(*part)
         .orderBy(F.col(n_tok_col).desc(), F.col(key))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(n_tok_col)).over(w)
    bin_id = F.floor((cum - F.col(n_tok_col)) / capacity).cast("long")
    return df.withColumns({
        "bin_id": bin_id,
        "bin_offset": (cum - F.col(n_tok_col)) - bin_id * capacity,
        "oversize": F.col(n_tok_col) > capacity,
    })


def packing_stats(packed: DataFrame, n_tok_col: str,
                  partition_col: str | None = None) -> DataFrame:
    """Per-partition packing report: bins spanned, total tokens, oversize
    count. One aggregation over the packed table."""
    part = [partition_col] if partition_col else []
    gb = packed.groupBy(*part) if part else packed.groupBy()
    return gb.agg(
        (F.max("bin_id") + 1).alias("bins_used"),
        F.sum(F.col(n_tok_col)).alias("total_tokens"),
        F.sum(F.when(F.col("oversize"), 1).otherwise(0)).alias("oversize_seqs"),
    )
