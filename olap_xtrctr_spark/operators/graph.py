"""Distributed connected components — the transitive-closure primitive
behind duplicate-GROUP labeling (pairwise near-dup tables only say
"a~b"; corpus curation needs "a,b,c are ONE group" even when a~c was
never emitted).

Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round
is one groupBy(min) + one join over the edge list, and the edge set
contracts toward a star per component in O(log n) rounds (vs the
O(diameter) of naive min-label propagation, which a 25-node dup CHAIN
would drag to 24 rounds).  No collect(), no driver-side graph: the
edge list stays distributed; each round's output is
``localCheckpoint``-ed so the iterative lineage cannot snowball into
an exponential plan.

Convergence: a round that changes nothing (same edge multiset) ends
the loop — checked with one tiny aggregate (count + order-independent
xxhash64 checksum), not a full except().

Reference parity note: the reference engine has no graph operator
(verified — SURVEY §2); this is part of the beyond-reference pipeline
surface (dup-group consolidation for keep-one-per-group dedup).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_ROUNDS = 50     # ~log2(n) expected; 50 is a loud-failure backstop


def _canon(edges: DataFrame) -> DataFrame:
    """Drop self-loops, orient u > v (parent-pointer convention:
    every edge points from a node to a SMALLER candidate root), and
    dedup."""
    return (edges
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to the
    minimum of Γ(u) ∪ {u}."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u (edges already oriented u > v): connect every
    smaller-or-equal neighbor AND u itself to the minimum neighbor."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = e.select("u", "v").union(
        e.select("u", F.col("u").alias("v")).distinct())
    return (nbrs.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .distinct())


def _checksum(e: DataFrame):
    # bit_xor: order-independent and overflow-free (a SUM of full-range
    # xxhash64 longs overflows under ANSI arithmetic); the edge set is
    # distinct, so xor self-cancellation cannot trigger
    return e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"),
                   F.lit(0)).alias("h")).first()


def connected_components(edges: DataFrame, src: str = "u",
                         dst: str = "v") -> DataFrame:
    """Component labels for every node of the (undirected) edge list:
    returns ``(node, component)`` where ``component`` is the SMALLEST
    node id in the node's connected component — the canonical
    representative, deterministic on any engine.  Nodes never named
    by an edge don't appear (callers join back and coalesce to the
    node's own id for singletons)."""
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType)
    ok = (ByteType, ShortType, IntegerType, LongType)
    for c in (src, dst):
        t = edges.schema[c].dataType
        if not isinstance(t, ok):
            # fail CLEANLY (ANSI mode would throw a cast error deep in
            # round 1 otherwise): string/decimal node ids must be
            # hashed to longs first (xxhash64) by the caller
            raise ValueError(
                f"connected_components: edge column {c!r} has type "
                f"{t.simpleString()}, need an integral node id — hash "
                f"non-integer ids to longs first (e.g. xxhash64)")
    e = _canon(edges.select(F.col(src).cast("long").alias("u"),
                            F.col(dst).cast("long").alias("v")))
    e = e.localCheckpoint(eager=True)
    prev = _checksum(e)
    for _ in range(_MAX_ROUNDS):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {_MAX_ROUNDS} "
            f"rounds — edge set is pathological or non-long ids "
            f"collided; inspect the input")
    # converged edge set is a star forest: u -> component root v
    nodes = e.select(F.col("u").alias("node"),
                     F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"),
                     F.col("v").alias("component")).distinct()
    return nodes.union(roots).distinct()


def chain_components(df: DataFrame, id_col, key) -> DataFrame:
    """Component labels from the MINIMAL spanning chain of each
    equal-``key`` group: per group (ids sorted) only consecutive ids
    become edges, so the component algorithm must do real transitive
    work to reunite the group — this is the standard way to hand a
    full-SQL-oracle workload to a CC implementation (the oracle states
    ``min(id) over (partition by key)``; the engine recovers it from
    chains).  Rows whose key-group is a singleton label themselves.
    Output ``(id_col, component)`` for EVERY input row."""
    from pyspark.sql import Window

    k = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy("_k").orderBy(id_col)
    chained = (df.select(F.col(id_col), k.alias("_k"))
               .withColumn("_prev", F.lag(id_col).over(w)))
    edges = chained.filter(F.col("_prev").isNotNull()) \
        .select(F.col("_prev").alias("u"), F.col(id_col).alias("v"))
    comp = connected_components(edges)
    return (df.select(id_col)
            .join(comp, df[id_col] == comp["node"], "left")
            .select(F.col(id_col),
                    F.coalesce("component", F.col(id_col))
                    .alias("component")))


def dup_groups(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Transitive exact-duplicate GROUP labels: md5-equal texts chain
    into edges, connected components reunite the chains, singleton
    docs label themselves.  component = smallest doc_id with
    identical text."""
    return chain_components(docs, id_col, F.md5(F.col(text_col)))
