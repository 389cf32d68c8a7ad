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


def chunk_sequences(df: DataFrame, key: str, tokens_col: str,
                    max_len: int, stride: int | None = None,
                    min_tail: int = 1) -> DataFrame:
    """Context-window chunking: split each token sequence into windows
    of ``max_len`` tokens advancing by ``stride`` (default = max_len:
    disjoint chunks; stride < max_len: overlapping windows, the
    standard LM train-prep shape).  Output: one row per chunk —
    ``(…input columns…, chunk_idx, chunk_tokens, chunk_len)``.

    The chunk count for a row is ``1 + ceil(max(0, n − max_len) /
    stride)`` — every token is covered, the final window is the tail
    (possibly shorter; tails below ``min_tail`` tokens are dropped
    UNLESS they are the sequence's only chunk).  Empty/NULL token
    arrays produce no chunks.

    Scale contract: pure projection — ``transform`` over a
    ``sequence(0, n_chunks−1)`` literal range builds the slice starts,
    ``posexplode`` emits the chunks; NO shuffle, no Python, fan-out
    rides the scan.  The slice arithmetic is exact integers, so the
    DuckDB oracle replays chunk boundaries and checksums bit-for-bit.
    """
    max_len = int(max_len)
    stride = int(stride) if stride is not None else max_len
    if max_len < 1 or stride < 1:
        raise ValueError("max_len and stride must be >= 1")
    if stride > max_len:
        raise ValueError("stride must be <= max_len (gaps would drop "
                         "tokens)")
    toks = F.col(tokens_col)
    n = F.coalesce(F.array_size(toks), F.lit(0))
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(
        F.lit(1) + F.ceil(
            F.greatest(n - F.lit(max_len), F.lit(0))
            / F.lit(stride)).cast("int"))
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.slice(toks, i * stride + 1, max_len))
    keep = F.filter(
        F.transform(chunks, lambda c, i: F.struct(
            i.alias("chunk_idx"), c.alias("chunk_tokens"),
            F.array_size(c).alias("chunk_len"))),
        lambda s: (s["chunk_len"] >= F.lit(int(min_tail)))
        | (s["chunk_idx"] == 0))
    return (df.where(n > 0)
            .withColumn("__c", F.explode(keep))
            .select("*", F.col("__c.chunk_idx").alias("chunk_idx"),
                    F.col("__c.chunk_tokens").alias("chunk_tokens"),
                    F.col("__c.chunk_len").alias("chunk_len"))
            .drop("__c"))


def length_bucketed_batches(
    df: DataFrame,
    key: str,
    n_tok_col: str,
    batch_size: int,
    edges: list[float],
    shards: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Length-bucketed BATCH assignment — the padding-waste fix for
    padded (non-packed) training: a batch of mixed lengths pads every
    sequence to the batch max, so grouping similar lengths first cuts
    the wasted tokens to the within-bucket spread. Adds ``bucket``
    (index into the strictly-increasing ``edges``, same rule as the
    equi-depth drift histogram: #edges <= value), ``batch_id``
    ("bucket-shard-ordinal") and ``batch_seq`` (0-based slot).

    Scale shape: batches need SIMILAR lengths, not a global order — so
    numbering runs within (bucket, shard) where shard = hash(key) %
    shards, keeping every window partition at ~n/(buckets x shards)
    rows (one global sort per bucket would single-task 10^12/#buckets
    rows). Deterministic and partitioning-invariant: the order inside a
    shard is (hash, key). ``portable=True`` swaps xxhash64 for the md5
    hash the DuckDB oracle replays bit-for-bit.

    Pair with :func:`padding_stats` to measure the win; use
    :func:`pack_sequences` instead when the loader supports dense
    sample packing (packing beats bucketing whenever it's available)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    es = [float(e) for e in edges]
    if not es or sorted(es) != es or len(set(es)) != len(es):
        raise ValueError("edges must be a non-empty strictly increasing "
                         f"list, got {edges!r}")
    from jsonschema_valid_spark.functions.dedup import portable_hash60

    arr = F.array(*[F.lit(e) for e in es])
    bucket = F.size(F.filter(
        arr, lambda e: F.col(n_tok_col).cast("double") >= e)).cast("long")
    h = (portable_hash60(F.col(key).cast("string")) if portable
         else F.xxhash64(F.col(key).cast("string")))
    staged = df.withColumn("bucket", bucket) \
               .withColumn("__h", h) \
               .withColumn("__shard", F.pmod(F.col("__h"),
                                             F.lit(int(shards))))
    w = Window.partitionBy("bucket", "__shard").orderBy("__h", key)
    rn = F.row_number().over(w) - 1
    return (staged
            .withColumn("batch_seq", (rn % int(batch_size)).cast("int"))
            .withColumn("batch_id", F.concat_ws(
                "-", F.col("bucket"), F.col("__shard"),
                F.floor(rn / int(batch_size)).cast("long")))
            .drop("__h", "__shard"))


def padding_stats(batches: DataFrame, n_tok_col: str,
                  batch_col: str = "batch_id") -> DataFrame:
    """One-row padding report for a batch assignment: total real tokens,
    total padded slots (each batch pads to its own max length), and
    ``efficiency`` = real / padded — the number length bucketing exists
    to raise. One two-level aggregate (per-batch max+count, then the
    global sums)."""
    per = (batches.groupBy(batch_col)
           .agg(F.sum(n_tok_col).alias("real"),
                (F.max(n_tok_col) * F.count(F.lit(1))).alias("padded")))
    return per.agg(
        F.sum("real").alias("real_tokens"),
        F.sum("padded").alias("padded_tokens"),
        (F.sum("real") / F.sum("padded")).alias("efficiency"))
