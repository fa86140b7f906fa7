"""Graph analytics over relational edge lists — PageRank.

Complements the min-label-propagation connected components in
``operators.dedup`` with the other canonical iterative graph kernel.
Reference parity note: the reference pipeline has no graph operator;
this is a north-star extension for link/citation analysis over
training-corpus graphs (document-similarity graphs, domain graphs,
co-occurrence graphs) where PageRank-style centrality is the standard
quality/dedup-priority signal.

Scale design:

- The edge list is joined with out-degrees ONCE and persisted
  (``localCheckpoint``) — every Lloyd-style iteration reuses the
  materialized (src, dst, deg) relation instead of re-deriving the
  upstream plan (same frontier discipline as ``dedup.kmeans_centroids``
  and ``dedup.connected_components``).
- One iteration = one shuffle join (ranks ⋈ edges on src) + one
  hash aggregation (groupBy dst). Rank state is |V| rows of two
  BIGINTs — never the edge payload.
- **Exact integer arithmetic**: ranks are micro-units (1e6 = 1.0).
  Per-edge contribution is ``rank div deg`` (integer floor), the
  damping step is ``(85 · Σ contrib) div 100 + 150000``. Every
  operation is exact BIGINT math, so the result is bit-identical on
  any partitioning, any cluster size, and in the DuckDB oracle's
  unrolled recursive CTE. (Float PageRank sums in shuffle order are
  not reproducible; integer floor division loses <1 micro-unit per
  edge and is.)
- Teleport mass uses the per-node convention (Σ ranks ≈ |V|·1e6):
  r'(v) = 0.15·1e6 + 0.85·Σ_{u→v} r(u)/deg(u). Dangling nodes
  cannot occur on a symmetrized edge list (every node has deg ≥ 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_MICRO = 1_000_000
TELEPORT_MICRO = 150_000  # 0.15 in micro-units


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge list -> both directed arcs, deduplicated."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).distinct()


def _pagerank_symmetric(
    edges: DataFrame,
    n_iter: int,
    src: str,
    dst: str,
    checkpoint_every: int,
    broadcast_threshold: int,
) -> DataFrame | None:
    """Exchange-free PageRank over an UNDIRECTED edge list.

    Takes the raw undirected edges (NOT pre-symmetrized) and exploits
    symmetry twice:

    - **Build is ONE shuffle.** Both arc orientations union'd (dupes
      fine) → ``groupBy(node).collect_set`` builds the neighbor list —
      the dedup that ``symmetrize().distinct()`` + a separate degree agg
      would each pay a shuffle for happens inside the single
      aggregation's map-side partials. On a symmetric graph the in- and
      out-neighbor sets coincide, so one adjacency serves both the
      degree (``size(nbrs)``) and the inbound sum.
    - **Iterations have ZERO exchanges.** The checkpointed adjacency is
      hash-partitioned on ``node`` from the build; per iteration,
      ``explode(nbrs)`` + broadcast-join of the (node, contrib) state +
      ``groupBy(node)`` all preserve that partitioning, so the per-edge
      contribution rows never cross the wire — the general path's
      per-iteration 85·|E|-row shuffle disappears. Every node has
      deg ≥ 1 on a symmetric graph, so the aggregation covers the full
      node set and no dangling-node union is needed.

    The state broadcast carries ``contrib = rank div deg`` (deg is a
    node-local fact), so the arithmetic — div before sum, exact BIGINT —
    is identical bit-for-bit to the general edge-relation path and the
    oracle's unrolled CTE.

    Scale bound, stated plainly: rows hold full neighbor lists, so the
    widest row is O(max degree) — the right representation exactly in
    the broadcast-state regime (|V| small enough to broadcast implies
    adjacency rows fit); a billion-node/power-law graph should use the
    general path, whose edge relation never widens. The bound is
    ENFORCED, not just documented: after the adjacency materializes,
    |V| > ``broadcast_threshold`` returns None and :func:`pagerank`
    reroutes to the general shuffle-join plan (bit-identical ranks),
    instead of broadcasting an unbroadcastable state every iteration.
    """
    # Both orientations as unionByName(self-reversed) — two scans of
    # the 2-column edge projection. A single-scan 2-struct explode was
    # A/B'd in r15 (with and without fan_out, at 32 and 8 cores) and
    # REJECTED: +0.5-1.2 s on every pair — the Generate breaks the
    # scan→partial-agg codegen pipeline, which costs more than the
    # second columnar scan at every measured width.
    und = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    both = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = (
        both.groupBy(F.col("dst").alias("node"))
        .agg(F.collect_set("src").alias("nbrs"))
        .select("node", "nbrs", F.size("nbrs").cast("long").alias("deg"))
        .localCheckpoint()
    )
    if adj.count() > broadcast_threshold:
        return None  # caller falls back to the general shuffle-join path
    state = adj.select(
        "node",
        F.lit(BASE_MICRO).cast("long").alias("rank_micro"),
        F.expr(f"CAST({BASE_MICRO} AS BIGINT) div deg").alias("contrib"),
    )
    for i in range(n_iter):
        stt = F.broadcast(state.select(F.col("node").alias("u"), "contrib"))
        ranked = (
            adj.select("node", "deg", F.explode("nbrs").alias("u"))
            .join(stt, "u")
            .groupBy("node", "deg")
            .agg(F.sum("contrib").alias("s"))
            .select(
                "node",
                "deg",
                (F.lit(TELEPORT_MICRO) + F.expr("85 * s div 100"))
                .cast("long")
                .alias("rank_micro"),
            )
        )
        state = ranked.select(
            "node", "rank_micro", F.expr("rank_micro div deg").alias("contrib")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            state = state.localCheckpoint()
    return state.select("node", "rank_micro")


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
    assume_distinct: bool = False,
    broadcast_state: bool | None = None,
    broadcast_threshold: int = 2_000_000,
    symmetric: bool = False,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list.

    ``edges`` must already contain every arc to walk (use
    :func:`symmetrize` for undirected graphs). Returns one row per
    node: (node, rank_micro) where rank_micro is the damped rank in
    micro-units after ``n_iter`` synchronous iterations from a uniform
    1e6 start.

    Materialization strategy: the STATIC relations — (src, dst, deg)
    and the node set — are localCheckpoint-ed once and re-read by every
    iteration. The rank state itself stays LAZY: each rank DataFrame is
    consumed exactly once by the next iteration's join, so chaining
    n_iter join+agg stages into one plan executes every stage exactly
    once with zero per-iteration job-scheduling barriers (measured ~2×
    faster than checkpointing each iteration at 5 iterations on
    local[32] — a materialization barrier per iteration is pure
    fixed-overhead). ``checkpoint_every`` bounds plan depth for large
    ``n_iter`` (Catalyst optimization time grows with the chain), the
    same frontier discipline as ``dedup.connected_components``.

    Rank-state join strategy (``broadcast_state``): the per-iteration
    join is edges ⋈ rank-state, where the state is 2 BIGINTs per node.
    ``None`` (default) auto-picks after the node set materializes:
    |V| ≤ ``broadcast_threshold`` → BROADCAST the state (the edge
    relation never reshuffles or re-sorts; each iteration is one
    map-side hash join + one combined aggregation), else the scale
    path — edges pre-repartitioned on src once, shuffle-joining only
    the |V|-row state per iteration (a billion-node state cannot
    broadcast). The arithmetic is partition-independent either way, so
    both strategies return bit-identical ranks.

    ``symmetric=True`` declares ``edges`` an UNDIRECTED edge list (do
    NOT pre-:func:`symmetrize` — both orientations are generated and
    deduplicated internally) and takes :func:`_pagerank_symmetric`'s
    one-shuffle-build / zero-exchange-iteration plan while |V| ≤
    ``broadcast_threshold``; above it the call falls back to the
    general shuffle-join path automatically. Results are bit-identical
    to ``pagerank(symmetrize(e), assume_distinct=True)`` either way.
    """
    if symmetric:
        result = _pagerank_symmetric(
            edges, n_iter, src, dst, checkpoint_every, broadcast_threshold
        )
        if result is not None:
            return result
        # |V| exceeds the broadcast-state bound: the zero-exchange plan
        # would broadcast an unbroadcastable |V|-row state every
        # iteration. Reroute to the general edge-relation path (both
        # orientations, distinct — exactly symmetrize()'s contract) on
        # its shuffle-join state strategy; ranks are bit-identical.
        edges = symmetrize(edges, src=src, dst=dst)
        src, dst = "src", "dst"
        assume_distinct = True
        broadcast_state = False
    arcs = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        # contract on arbitrary input; symmetrize() output is already
        # distinct — pass assume_distinct=True there to skip a shuffle
        arcs = arcs.distinct()
    deg = arcs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    arcs_deg = arcs.join(deg, "src").localCheckpoint()

    nodes = (
        arcs_deg.select(F.col("src").alias("node"))
        .union(arcs_deg.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint()
    if broadcast_state is None:
        # nodes is materialized — count() is a metadata-cheap job
        broadcast_state = nodes.count() <= broadcast_threshold
    if not broadcast_state:
        # Scale path: re-materialize (src, dst, deg) PRE-PARTITIONED on
        # src — localCheckpoint preserves outputPartitioning, so every
        # iteration's state-join shuffles only the tiny rank state;
        # the edge payload never crosses the wire again.
        arcs_deg = arcs_deg.repartition(F.col("src")).localCheckpoint()
    ranks = None

    # Nodes with no inbound arcs keep only the teleport term: instead of
    # a per-iteration LEFT JOIN against the node set (an extra shuffle
    # join per iteration), fold a zero-contribution row per node into
    # the SAME aggregation — the dangling correction rides the contrib
    # shuffle for free (map-side combined, |V| extra rows).
    zero = nodes.select(
        F.col("node").alias("dst"), F.lit(0).cast("long").alias("contrib")
    )
    for i in range(n_iter):
        if ranks is None:
            # Uniform BASE_MICRO start — iteration 1's contribution is a
            # pure projection of the edge relation, no state join.
            contrib = arcs_deg.select(
                F.col("dst"),
                F.expr(f"CAST({BASE_MICRO} AS BIGINT) div deg").alias("contrib"),
            )
        else:
            state = ranks.withColumnRenamed("node", "src")
            if broadcast_state:
                state = F.broadcast(state)
            contrib = arcs_deg.join(state, "src").select(
                F.col("dst"),
                F.expr("rank_micro div deg").alias("contrib"),
            )
        ranks = (
            contrib.unionByName(zero)
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(TELEPORT_MICRO) + F.expr("85 * s div 100"))
                .cast("long")
                .alias("rank_micro"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint()

    if ranks is None:  # n_iter == 0 — the uniform start state
        return nodes.select(
            "node", F.lit(BASE_MICRO).cast("long").alias("rank_micro")
        )
    return ranks


def pagerank_top(
    edges: DataFrame,
    n_iter: int = 5,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Top-k PageRank nodes with a total (rank desc, node asc) order."""
    return (
        pagerank(edges, n_iter=n_iter, src=src, dst=dst,
                 assume_distinct=assume_distinct, symmetric=symmetric)
        .orderBy(F.desc("rank_micro"), F.asc("node"))
        .limit(k)
    )


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    broadcast_state: bool | None = None,
    broadcast_threshold: int = 2_000_000,
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs & authorities in exact integer arithmetic.

    Kleinberg's pair to PageRank, natural on bipartite graphs (here:
    hub score over ``src`` nodes, authority over ``dst``). Each
    iteration is the two mutual sums

        h(u) = Σ_{u→v} a(v);   a(v) = Σ_{u→v} h(u)

    followed by **max-normalization in micro-units** (``s·10⁶ div
    max(s)``) instead of the textbook L2 norm: the max is an exact
    integer scalar (a 1-row broadcast — the engine's standard
    corpus-scalar shape), so every score stays exact BIGINT and the
    result is bit-identical on any partitioning and in the DuckDB
    oracle's unrolled CTE. L2 would need a square root — float, order-
    sensitive, unhashable.

    Same materialization discipline as :func:`pagerank`: the edge list
    is checkpointed once; each half-iteration is one join + one
    aggregation over it; score state is |V| rows of two BIGINTs, and
    the state join auto-broadcasts below ``broadcast_threshold`` nodes
    (same strategy + bit-identity argument as ``pagerank``'s
    ``broadcast_state`` — above it, the shuffle join is the scale path).

    Returns (hubs, authorities): (node, score_micro) each.
    """
    if n_iter < 1:
        raise ValueError(f"hits() needs n_iter >= 1, got {n_iter}")
    arcs = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    arcs = arcs.localCheckpoint()
    if broadcast_state is None:
        sizes = arcs.agg(
            F.countDistinct("src").alias("ns"), F.countDistinct("dst").alias("nd")
        ).collect()[0]
        broadcast_state = max(sizes["ns"], sizes["nd"]) <= broadcast_threshold

    def _state(df):
        return F.broadcast(df) if broadcast_state else df

    auth = arcs.select(F.col("dst").alias("node")).distinct().select(
        F.col("node").alias("dst"), F.lit(BASE_MICRO).cast("long").alias("score")
    )
    hubs = None
    for _ in range(n_iter):
        # each half-iteration is consumed TWICE (scores + its max) —
        # checkpoint the |V|-row raw relation or lineage recompute
        # compounds ~2x per half-iteration (measured 22s -> 7s at sf0.01)
        h = (
            arcs.join(_state(auth), "dst")
            .groupBy("src")
            .agg(F.sum("score").alias("raw"))
        ).localCheckpoint()
        hmax = h.agg(F.max("raw").alias("mx"))
        hubs = h.crossJoin(F.broadcast(hmax)).select(
            F.col("src").alias("node"),
            F.expr("CAST(CAST(raw AS DECIMAL(38,0)) * 1000000 DIV mx AS BIGINT)").alias("score"),
        )
        a = (
            arcs.join(_state(hubs.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
        ).localCheckpoint()
        amax = a.agg(F.max("raw").alias("mx"))
        auth = a.crossJoin(F.broadcast(amax)).select(
            F.col("dst"),
            F.expr("CAST(CAST(raw AS DECIMAL(38,0)) * 1000000 DIV mx AS BIGINT)").alias("score"),
        )
    return hubs, auth.withColumnRenamed("dst", "node")


def hits_top(
    edges: DataFrame,
    n_iter: int = 3,
    k: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k hubs and authorities as one relation (role, node, score)."""
    hubs, auth = hits(edges, n_iter=n_iter, src=src, dst=dst)
    top_h = (
        hubs.orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
        .select(F.lit("hub").alias("role"), "node", F.col("score").alias("score_micro"))
    )
    top_a = (
        auth.orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
        .select(F.lit("authority").alias("role"), "node", F.col("score").alias("score_micro"))
    )
    return top_h.unionByName(top_a)
