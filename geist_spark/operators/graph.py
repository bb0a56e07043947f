"""Iterative graph operators (PageRank family).

Complements dedup.py's connected-components (min-label propagation)
with rank propagation. Same reproducibility discipline as the
fixed-point k-means family: every rank is a scaled long, every
division is exact integer floor division (spelled subtract-pmod so the
double-division path is exactly divisible and therefore exact), so the
result is bit-identical at any parallelism and replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1 << 30  # rank grid: ranks sum to ~PR_SCALE


def _floordiv(a: F.Column, b: F.Column) -> F.Column:
    """Exact floor division for non-negative longs: (a - a mod b) / b
    is exactly divisible, so the double division is exact and the cast
    back to long is lossless (results stay far below 2^53)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank over an edge list (simplified model: no
    dangling-mass redistribution — a node with no out-edges absorbs
    its rank, the standard formulation for link-graph dedup/authority
    scoring at corpus scale).

        pr0        = PR_SCALE // n
        base       = ((den - num) * pr0) // den
        share(j)   = pr(j) // outdeg(j)
        pr'(i)     = base + (num * sum_in(shares)) // den

    All quantities are longs; `//` is floor division (operands are
    non-negative, so DuckDB's truncating // replays it exactly).

    Plan per iteration: ranks join edges on src (shuffle on src),
    partial-agg sum per dst, left join back onto the node set — two
    shuffles, both on node keys, the same shape as connected
    components. Node count n is one driver scalar (a 1-row agg, like
    the IVF centroid collect). Lineage is truncated with
    localCheckpoint every iteration so `iters` stays O(iters) not
    O(iters^2) at plan-build time.

    Returns (node, pr) with pr on the PR_SCALE grid.
    """
    s, d = F.col(src_col), F.col(dst_col)
    # the edge list is consumed 2 + iters times (nodes, outdeg, one
    # join per iteration). A lazy persist() here was NOT enough: the
    # first action used to be nodes.count(), whose two union legs each
    # replayed the caller's full edge-build lineage before the cache
    # existed (for textrank_keywords that is the corpus tokenize +
    # adjacency explode — a doubled 64-task stage, ~9.5 s execRun at
    # sf0.1) and the iteration joins kept re-deriving it. An EAGER
    # localCheckpoint materializes the edge list once, up front, and
    # every consumer reads the checkpointed blocks — measured cache-hit
    # scans of ~0.4 s vs 4-6 s recompute stages per iteration. Edge
    # lists are vocabulary/link grain — exactly what a cluster job
    # would materialize before an iterative solve — and a checkpoint
    # cannot leave a CacheManager fragment behind (the miscompile
    # class train_ivf_centroids documents).
    e = edges.select(s.alias("src"), d.alias("dst")).localCheckpoint(
        eager=True
    )
    # LAZY checkpoint: the count() below is a full materialization (no
    # short-circuit CollectLimit), so the node set lands in stored
    # blocks inside the count's own job instead of paying a separate
    # eager action first (~0.1-0.3 s of per-action driver latency on
    # this host class). `e` above stays EAGER: its two union legs here
    # would otherwise race to compute the unmaterialized edge RDD.
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge list")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    num, den = damping_num, damping_den
    pr0 = PR_SCALE // n
    base = ((den - num) * pr0) // den

    ranks = nodes.withColumn("pr", F.lit(pr0).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, F.col("src") == F.col("node"))
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node_in"),
                _floordiv(F.col("pr"), F.col("deg")).alias("share"),
            )
            .groupBy("node_in")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.node_in, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + _floordiv(
                        F.lit(num) * F.coalesce(F.col("inflow"), F.lit(0)),
                        F.lit(den),
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    # e and nodes are checkpoints (no CacheManager entries to drop);
    # materialize the final ranks off the lazy-checkpoint chain
    out = ranks.localCheckpoint(eager=True)
    return out


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected graph — the
    clustering/community signal next to pagerank's authority signal.

    Scalable formulation (Suri & Vassilvitskii's "curse of the last
    reducer" fix): orient every edge from its LOWER-degree endpoint to
    the higher (ties by id), so each wedge is generated exactly once
    at its lowest-degree vertex and a celebrity node of degree d
    produces O(d) oriented out-edges instead of O(d^2) wedges. Plan:
    distinct canonical edges (1 shuffle), degree table joined back
    (edge-keyed shuffles), wedge self-join on the oriented source,
    closure check against the canonical edge set, explode 3 corners,
    count per vertex. Every join is an equi-join on vertex/edge keys.

    Output: (node, n_triangles) for nodes in >= 1 triangle.
    """
    s, d = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(
            F.least(s, d).alias("u"), F.greatest(s, d).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # merge hints throughout: edge and degree tables are graph-sized;
    # static estimates of derived frames under-count (the measured
    # exploded-index broadcast hazard, SCALE.md), and a broadcast
    # build of the edge set is a driver OOM on any real graph
    du = deg.hint("merge").select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.hint("merge").select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    # orient low-(deg, id) -> high-(deg, id)
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1, e2 = oriented.alias("e1"), oriented.hint("merge").alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")),
    ).select(
        F.col("e1.a").alias("w_a"),
        F.col("e1.b").alias("w_b"),
        F.col("e2.b").alias("w_c"),
    )
    closed = wedges.join(
        und.hint("merge"),
        (F.least(F.col("w_b"), F.col("w_c")) == F.col("u"))
        & (F.greatest(F.col("w_b"), F.col("w_c")) == F.col("v")),
    )
    corners = closed.select(
        F.explode(F.array("w_a", "w_b", "w_c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_iterations: int = 20,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Batagelj-Zaversnik distributed formulation): repeatedly drop
    vertices whose degree in the SURVIVING subgraph is below k until a
    fixed point — the standard dense-substructure extractor (spam link
    farms, co-citation cores, community seeding) that complements
    pagerank's authority scores and triangle_counts' local density.

    Input (src, dst) is treated as UNDIRECTED (mirrored, self-loops
    dropped, parallel edges deduped). Returns the surviving vertices
    with their degree inside the k-core: (node, degree), degree >= k.

    Plan shape per round: one groupBy(node) degree count + two
    semi-joins to drop edges touching peeled vertices, all keyed on
    the vertex — the same key partitioning reused. The edge set only
    SHRINKS, so at 100 TB round cost is monotonically decreasing;
    convergence is checked on the same aggregate (a bounded 1-row
    count). Early exit at the fixed point is safe: peeling is
    monotone, extra rounds are no-ops (the oracle replays a fixed
    unroll of rounds — both land on the same fixed point).

    No reference equivalent (geist has no joins, README.md:21); built
    for the driver's graph-analytics mandate.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    und = (
        edges.select(F.col("src"), F.col("dst"))
        .filter(F.col("src") != F.col("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    # lazy checkpoint + count: the count is a full materialization, so
    # one action both stores the mirrored edge set and measures it
    # (pagerank's nodes fusion; saves one driver action per call)
    und = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_n = und.count()
    converged = prev_n == 0
    # per-round eager checkpoints accumulate in the block manager until
    # the superseded python handles are GC'd (ContextCleaner) — the
    # same policy as dedup_clusters' propagation rounds; the edge set
    # only shrinks, so the initial mirrored set dominates peak storage
    for _ in range(max_iterations):
        if converged:
            break
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        pruned = (
            und.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            # USING-join moved dst first: restore (src, dst)
            .select("src", "dst")
            # lazy: materialized in full by the convergence count below
            # (one action per round instead of two); the returned frame
            # always sits on stored blocks because the count runs every
            # round, so no lazy chain ever escapes to a caller
            .localCheckpoint(eager=False)
        )
        n_after = pruned.count()
        und = pruned
        converged = n_after == prev_n
        prev_n = n_after
    if not converged:
        # a partially-peeled edge set still contains degree<k vertices
        # — returning it would silently violate the contract (a path
        # graph peels only its 2 endpoints per round, so long chains
        # legitimately need ~n/2 rounds)
        raise RuntimeError(
            f"kcore did not converge in {max_iterations} rounds; "
            "raise max_iterations (peeling needs up to ~longest-chain/2 "
            "rounds)"
        )
    return und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
