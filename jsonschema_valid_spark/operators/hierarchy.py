"""Hierarchy validation: parent-pointer ancestry — the ``x-acyclic``
keyword (every node's parent chain must reach a root within
``maxDepth`` steps: no cycles, no over-deep chains).

The data-quality contract of every self-referential table — category
taxonomies, org charts, thread reply chains, folder trees, BOM
structures: one bad edge ("Electronics' parent is Phones, Phones'
parent is Electronics") and every recursive consumer (rollups, breadcrumb
renderers, permission inheritance) either loops forever or silently
truncates.  No other keyword can see it: ``x-referential`` proves the
parent EXISTS, ``x-functionalDependency`` proves it's UNIQUE — neither
walks the chain.

Scale contract — POINTER DOUBLING, never a per-step walk: the naive
check follows each chain one hop at a time (``maxDepth`` joins, each
over all n rows — O(n·D)); instead the 2^k-step jump table is squared
log2(D) times (``J_{k+1} = J_k ∘ J_k``, an equi-join of #unresolved
entries that only SHRINKS: entries reaching a root within 2^k steps
drop out and absence = resolved), and each node's state applies the
jump tables for the set bits of D — O(n·log D) join work total, ~12
bounded shuffles for the default D=64 instead of 64 full-table walks.
A node still unresolved after exactly D composed steps is a violation;
its ancestor-at-D is the witness (deterministic, so the DuckDB oracle
replays it bit-for-bit with a depth-bounded recursive CTE).

Semantics:

* Root = a node whose parent is NULL, equal to itself (the org-chart
  "CEO reports to self" convention — ``self_parent_root=False`` turns
  that into a 1-cycle violation instead), or absent from the node
  column (a dangling parent id ends the chain: x-referential's job,
  not this check's).
* A node with MULTIPLE distinct parents breaks the functional-graph
  precondition: flagged as its own violation (``multiparent k=…``) and
  excluded from chain evaluation (its chain is undefined).
* Violations name the node (doc_id) with ``anc@D=…`` — cycle members
  AND nodes feeding into a cycle AND chains genuinely deeper than D
  all surface (the three failure modes are indistinguishable to a
  bounded walk, deliberately: pick D above the legal max depth).

Reference: dataset-scope lift with no analog in the reference's row
keywords (validators.rs); jump tables ≙ Valiant (1975) pointer doubling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _grouped_edges(df: DataFrame, column: str, parent_col: str,
                   self_parent_root: bool) -> DataFrame:
    """ONE aggregation carrying everything the check needs per node:
    ``(__u, __mn/__p = min/max valid parent, __c = valid-parent rows)``
    — dedup, multi-parent detection (min != max ⟺ >= 2 distinct
    parents, no count_distinct Expand doubling the shuffle), and the
    edge table used to be three separate shuffles (distinct + groupBy +
    anti-join), each re-deriving the base scan; now the scan is read
    ONCE and the result is eagerly materialized because every
    downstream branch (edges, multi, dangling check, boundary
    semi-join) reuses it."""
    node, parent = F.col(column), F.col(parent_col)
    valid = parent.isNotNull()
    if self_parent_root:
        valid = valid & (node != parent)
    vp = F.when(valid, parent)
    g = (df.where(node.isNotNull())
         .groupBy(node.alias("__u"))
         .agg(F.min(vp).alias("__mn"), F.max(vp).alias("__p"),
              F.count(vp).alias("__c")))
    # r6: lazy checkpoint — the multi-parent probe is the first action and
    # doubles as the materialization job, so the dedicated eager job is
    # gone; every later branch reads the persisted aggregate as before
    return g.localCheckpoint(eager=False)


def _acyclic_parts(df: DataFrame, column: str, parent_col: str,
                   max_depth: int, self_parent_root: bool):
    """(unresolved (__node, __anc), multi-parent (__node, __k)) sharing
    one prep aggregation.

    Join strategy: every join here keys two similarly-sized long-keyed
    relations that are discarded immediately — the sort a merge join
    pays per side buys nothing downstream, so the build sides carry a
    shuffle_hash hint (measured ~2x on the dangling semi and the state
    apply at 2M nodes). Build partitions are jump-table-sized / #shuffle
    partitions; size spark.sql.shuffle.partitions so they fit executor
    memory at the target scale (the standard SHJ contract)."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    g = _grouped_edges(df, column, parent_col, self_parent_root)
    has_edge = F.col("__c") > 0
    multi_ids = (g.where(has_edge & (F.col("__mn") != F.col("__p")))
                 .select("__u"))
    # exact distinct-parent count (the multiparent witness) only over
    # the flagged ids — the common all-clean case pays a semi-filtered
    # scan and an empty aggregate instead of an Expand over every row.
    # r6: the flag probe is a limit(1) over the already-materialized
    # prep aggregate (one ~ms cached-scan job), so the ALL-CLEAN case
    # skips the base re-scan + semi-join + aggregate entirely — the
    # same data-dependent pruning AQE applies to empty relations, done
    # where AQE cannot see it (the branch is a separate job).
    node, parent = F.col(column), F.col(parent_col)
    valid = parent.isNotNull()
    if self_parent_root:
        valid = valid & (node != parent)
    if multi_ids.limit(1).count() == 0:
        node_type = df.schema[column].dataType
        multi = df.sparkSession.createDataFrame(
            [], T.StructType([T.StructField("__node", node_type),
                              T.StructField("__k", T.LongType())]))
    else:
        multi = (df.where(node.isNotNull() & valid)
                 .join(multi_ids.hint("shuffle_hash")
                       .withColumnRenamed("__u", column), column, "semi")
                 .groupBy(node.alias("__node"))
                 .agg(F.count_distinct(parent).alias("__k")))
    # a dangling parent (id not present as a node) ends the chain:
    # drop those edges so the chain resolves there
    edges = (g.where(has_edge & (F.col("__mn") == F.col("__p")))
             .select("__u", "__p")
             .join(g.select(F.col("__u").alias("__p"))
                   .hint("shuffle_hash"), "__p", "semi")
             .localCheckpoint(eager=False))

    # state: (node, ancestor after the steps consumed so far) for nodes
    # whose chain is still OPEN — rows whose ancestor leaves the jump
    # table are resolved (reach a root within the remaining budget) and
    # are DROPPED immediately instead of carried as __res=True ballast
    # through every later join. Roots (no valid edge) never enter.
    # r6: state starts LAZY (None) — the first applied jump table J_{2^b}
    # IS the state after 2^b steps (node -> ancestor, open chains only),
    # so the identity-state apply join is a pure rename. For a power-of-
    # two D (the common default 64 and the bench's 32) that removes the
    # one full-width state⋈jump join the old identity init paid.
    state = None
    jump = edges  # (__u -> __p): the 2^0-step table
    bits = int(max_depth)
    while bits:
        if bits & 1:
            if state is None:
                state = jump.select(F.col("__u").alias("__node"),
                                    F.col("__p").alias("__anc"))
            else:
                j = jump.select(F.col("__u").alias("__ju"),
                                F.col("__p").alias("__jp")) \
                    .hint("shuffle_hash")
                state = (state.join(j, state["__anc"] == j["__ju"], "left")
                         .where(F.col("__jp").isNotNull())
                         .select(F.col("__node"),
                                 F.col("__jp").alias("__anc")))
        bits >>= 1
        if bits:
            a = jump.select(F.col("__u"), F.col("__p").alias("__m"))
            b = jump.select(F.col("__u").alias("__m"),
                            F.col("__p")).hint("shuffle_hash")
            jump = a.join(b, "__m", "inner").select("__u", "__p")
            # EAGER materialization each level: J_k is referenced 2-3
            # times (both sides of the next composition + the state
            # apply) — left lazy, the physical plan re-derives the
            # whole lineage per reference, doubling per level (2^k
            # copies of the base scan; measured 17 s -> ~3 s at 2M
            # nodes). Also truncates the iterative lineage like the
            # connected-components operator. The FINAL composition is
            # referenced exactly once (the remaining apply), so its
            # materialization is pure overhead — leave it lazy and let
            # the apply's job fold the last join in.
            remaining_refs = (1 if bits & 1 else 0) + (2 if bits >> 1 else 0)
            if remaining_refs >= 2:
                # r6: eager=False — the checkpoint still pins each level
                # (first materialization persists, later references read
                # the cached blocks) but the per-level BLOCKING job is
                # gone: the final count computes the whole doubling chain
                # as one job with overlapping stages (measured ~0.4 s off
                # the component in alternating A/B, identical output)
                jump = jump.localCheckpoint(eager=False)
    # a chain that lands ON a root at exactly D steps is resolved: a
    # node violates only if its ancestor-at-D still has an outgoing
    # edge (the chain genuinely needs more than D steps)
    unres = state.join(
        edges.select(F.col("__u").alias("__anc")).hint("shuffle_hash"),
        "__anc", "semi")
    return unres, multi


def unresolved_ancestry(
    df: DataFrame,
    column: str,
    parent_col: str,
    max_depth: int = 64,
    self_parent_root: bool = True,
) -> DataFrame:
    """Nodes whose parent chain does NOT reach a root within
    ``max_depth`` steps, as ``(__node, __anc)`` — ``__anc`` is the
    ancestor after exactly ``max_depth`` composed steps (the
    deterministic witness).  Multi-parent nodes are excluded (see
    :func:`multi_parent_nodes`)."""
    unres, _ = _acyclic_parts(df, column, parent_col, max_depth,
                              self_parent_root)
    return unres


def multi_parent_nodes(
    df: DataFrame,
    column: str,
    parent_col: str,
    self_parent_root: bool = True,
) -> DataFrame:
    """Nodes with more than one distinct parent — the functional-graph
    precondition violations, as ``(__node, __k)``."""
    node, parent = F.col("__u"), F.col("__p")
    edges = (df.select(F.col(column).alias("__u"),
                       F.col(parent_col).alias("__p"))
             .where(node.isNotNull() & parent.isNotNull())
             .distinct())
    if self_parent_root:
        edges = edges.where(node != parent)
    return (edges.groupBy("__u").agg(F.count(F.lit(1)).alias("__k"))
            .where(F.col("__k") > 1)
            .select(F.col("__u").alias("__node"), F.col("__k")))


def acyclic_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    parent_col: str,
    max_depth: int = 64,
    self_parent_root: bool = True,
) -> DataFrame:
    """``x-acyclic`` execution as engine violation rows: unresolved
    chains (``anc@D=…`` — the ancestor after exactly D steps, exact
    and cross-engine deterministic) plus multi-parent precondition
    breaks (``multiparent k=…``)."""
    exp_msg = (f"{column} parent chain via {parent_col} reaches a root "
               f"within {int(max_depth)} steps")
    unres, multi = _acyclic_parts(df, column, parent_col, max_depth,
                                  self_parent_root)
    v1 = unres.select(
        F.col("__node").cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit(f"anc@{int(max_depth)}="),
                 F.col("__anc").cast("string")).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )
    v2 = multi.select(
        F.col("__node").cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("multiparent k="),
                 F.col("__k").cast("string")).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )
    return v1.unionByName(v2)
