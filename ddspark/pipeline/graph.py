"""Link-graph analytics for corpus curation.

PageRank over a link graph (page/host/domain) is the classic web-scale
quality prior for crawl curation (the reference has no graph ops; this is
part of the training-data-pipeline surface).  The implementation is the
textbook distributed formulation — per-iteration contribution join +
sum-aggregate over the edge list — but in *integer* arithmetic, so the
result is a deterministic function of the graph with no float summation
order anywhere: every iteration is exactly replayable in ANSI SQL (the
gate oracle unrolls the same iterations as chained CTEs).

Semantics (all integer, all exact):

- nodes = distinct(src) ∪ distinct(dst); edges deduped; N = |nodes|
- r_0(v) = total // N
- d(u) = out-degree of u over the deduped edges
- S_t(v) = Σ over in-edges (u→v) of r_{t-1}(u) // d(u)
- r_t(v) = ((dd−dn)·(total//N)) // dd  +  (dn·S_t(v)) // dd

with damping dn/dd (default 85/100).  Mass lost to floor division and to
dangling nodes is NOT redistributed — ranks are a quality *ordering*
signal, not a probability distribution, and exactness buys bit-replay.

Scale: per-iteration state is one (node, rank) row per node; each
iteration is one join edge⋈rank on src plus one sum-shuffle on dst —
the same shape GraphX/Pregel lowers to.  Lineage is cut per iteration
with localCheckpoint (the standard guard for iterative DataFrame plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "pagerank_integer",
    "pagerank_oracle_sql",
    "triangle_count",
    "triangle_count_oracle_sql",
    "degree_assortativity",
    "degree_assortativity_oracle_sql",
    "pagerank_personalized",
    "pagerank_personalized_oracle_sql",
    "k_core",
    "bfs_distances",
    "bfs_distances_oracle_sql",
    "clustering_coefficient",
    "clustering_coefficient_oracle_sql",
]


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    total: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> DataFrame:
    """Integer PageRank over ``edges``: returns ``(node, rank)`` after
    ``iters`` exact iterations (see module docstring for the recurrence).
    One driver-side scalar (the node count, for the uniform start mass)
    is the only collect."""
    dn, dd = damping
    if not (0 < dn < dd):
        raise ValueError(f"damping must be 0 < dn < dd, got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one scalar — the uniform start mass needs |V|
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    r0 = int(total) // n
    base = ((dd - dn) * r0) // dd

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)

    ranks = nodes.withColumn("rank", F.lit(r0).cast("long"))
    for _ in range(iters):
        sums = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("rank div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({dn} * coalesce(s, 0L)) div {dd}")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 5,
    total: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> str:
    """ANSI-SQL twin of :func:`pagerank_integer`: the same iterations
    unrolled as chained CTEs over ``edges_sql`` (a query producing
    ``src, dst``).  DuckDB-ready; every value is BIGINT arithmetic."""
    dn, dd = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
        " WHERE src IS NOT NULL AND dst IS NOT NULL),",
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        " nn AS (SELECT CAST({t} AS BIGINT) // COUNT(*) AS r0,".format(t=int(total)),
        f"   (({dd - dn}) * (CAST({int(total)} AS BIGINT) // COUNT(*))) // {dd} AS base",
        "  FROM nodes),",
        " deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),",
        " r0 AS (SELECT node, (SELECT r0 FROM nn) AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f", r{i} AS (SELECT n.node,"
            f" CAST((SELECT base FROM nn) + ({dn} * COALESCE(s.s, 0)) // {dd}"
            f"      AS BIGINT) AS r"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.dst AS node, SUM({prev}.r // deg.d) AS s"
            f"   FROM e JOIN {prev} ON e.src = {prev}.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY 1"
            f" ) s ON n.node = s.node)"
        )
        prev = f"r{i}"
    parts.append(f" SELECT node, r AS rank FROM {prev}")
    return "\n".join(parts)


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle count of the UNDIRECTED simple graph underlying
    ``edges``: one row ``(n_nodes, n_edges, n_triangles)``.

    The clustering / community-density signal for link-graph curation
    (spam farms show abnormal triangle density).  Self-loops drop;
    direction and duplicate edges collapse.

    Scale design — degree-ordered orientation (the standard bound for
    the two-path join): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, making the oriented
    out-degree of ANY node at most O(sqrt(|E|)); then count pairs of
    oriented wedges ``a→b, a→c`` closed by the oriented edge ``b→c``.
    Each triangle is counted exactly once, and the wedge join's fan-out
    per node is bounded by that sqrt — a raw-degree join on a power-law
    graph would square the hub degree instead.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): strict total order, ties broken by id
    ed = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("o")
        )
        .select("o.a", "o.b")
    )
    w1 = ed.select(F.col("a"), F.col("b").alias("x"))
    w2 = ed.select(F.col("a"), F.col("b").alias("y"))
    wedges = w1.join(w2, "a").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        ed.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
            ed.select(F.col("b").alias("x"), F.col("a").alias("y"))
        ).where(F.col("x") < F.col("y")).distinct(),
        ["x", "y"],
        "left_semi",
    )
    return (
        closed.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def triangle_count_oracle_sql(edges_sql: str) -> str:
    """ANSI twin of :func:`triangle_count` over an edge subquery with
    columns (src, dst) — canonical undirected triangle join u<v<w."""
    return f"""
WITH raw AS ({edges_sql}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
nodes AS (SELECT COUNT(DISTINCT n) AS n_nodes FROM (
  SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
)),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT nodes.n_nodes AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       tri.n_triangles AS n_triangles
FROM nodes CROSS JOIN tri
""".strip()


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity of the undirected simple graph: the exact
    Pearson correlation of endpoint degrees over all symmetrized edge
    slots — one row ``(n, corr)`` (n = 2·|E|).

    Positive: hubs link to hubs (social graphs); negative: hubs link to
    leaves (web/biology).  A one-number structural fingerprint to
    monitor across crawl snapshots.  Degrees are exact integers and the
    correlation runs through
    :func:`ddspark.profile.pearson_corr_exact`'s DECIMAL-sum fixed-order
    path, so the value hash-matches cross-engine.  Plan: one distinct +
    one degree aggregation + two degree joins — all keyed by node id.
    """
    from ddspark.profile import pearson_corr_exact

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    pairs = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select("du", "dv")
    )
    sym = pairs.unionAll(
        pairs.select(F.col("dv").alias("du"), F.col("du").alias("dv"))
    )
    return pearson_corr_exact(sym, "du", "dv")


def degree_assortativity_oracle_sql(edges_sql: str) -> str:
    """ANSI twin of :func:`degree_assortativity`."""
    from ddspark.profile import pearson_corr_exact_oracle_sql

    sym = f"""(
WITH raw AS ({edges_sql}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
  ) GROUP BY n
),
pairs AS (
  SELECT d1.d AS du, d2.d AS dv
  FROM e JOIN deg d1 ON d1.n = e.u JOIN deg d2 ON d2.n = e.v
)
SELECT du, dv FROM pairs
UNION ALL
SELECT dv AS du, du AS dv FROM pairs
) sym"""
    return pearson_corr_exact_oracle_sql(sym, "du", "dv")


def pagerank_personalized(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    total: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: the teleport mass lands on
    ``seeds`` only, so ranks measure proximity TO THE SEED SET — the
    "find pages like these trusted ones" / TrustRank-style crawl-curation
    prior, where uniform PageRank measures global importance.

    Same exact-integer recurrence as :func:`pagerank_integer` (floor-div
    damping, no float summation order): start mass ``total // n_seeds``
    on each seed, per-iteration
    ``rank = seed_base(node) + (dn·Σ contrib) div dd`` with
    ``seed_base = ((dd−dn)·(total // n_seeds)) div dd`` on seeds and 0
    elsewhere.  ``seeds`` is a literal list (an ``isin`` expression, not
    a join) — personalization sets are small by nature.
    """
    dn, dd = damping
    if not (0 < dn < dd):
        raise ValueError(f"damping must be 0 < dn < dd, got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not seeds:
        raise ValueError("pagerank_personalized needs at least one seed")
    seeds = sorted(set(seeds))

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    r0 = int(total) // len(seeds)
    base = ((dd - dn) * r0) // dd
    is_seed = F.col("node").isin(seeds)

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)

    ranks = nodes.withColumn(
        "rank", F.when(is_seed, F.lit(r0)).otherwise(F.lit(0)).cast("long")
    )
    for _ in range(iters):
        sums = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("rank div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .select(
                "node",
                (
                    F.when(is_seed, F.lit(base)).otherwise(F.lit(0))
                    + F.expr(f"({dn} * coalesce(s, 0L)) div {dd}")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_personalized_oracle_sql(
    edges_sql: str,
    seeds: list,
    iters: int = 5,
    total: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> str:
    """ANSI twin of :func:`pagerank_personalized` (unrolled CTEs)."""
    dn, dd = damping
    seeds = sorted(set(seeds))
    seed_list = ", ".join(str(int(s)) for s in seeds)
    r0 = int(total) // len(seeds)
    base = ((dd - dn) * r0) // dd
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
        " WHERE src IS NOT NULL AND dst IS NOT NULL),",
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        " deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),",
        f" r0 AS (SELECT node, CAST(CASE WHEN node IN ({seed_list})"
        f" THEN {r0} ELSE 0 END AS BIGINT) AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f", r{i} AS (SELECT n.node,"
            f" CAST(CASE WHEN n.node IN ({seed_list}) THEN {base} ELSE 0 END"
            f"      + ({dn} * COALESCE(s.s, 0)) // {dd} AS BIGINT) AS r"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.dst AS node, SUM({prev}.r // deg.d) AS s"
            f"   FROM e JOIN {prev} ON e.src = {prev}.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY 1"
            f" ) s ON n.node = s.node)"
        )
        prev = f"r{i}"
    parts.append(f" SELECT node, r AS rank FROM {prev}")
    return "\n".join(parts)


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 100,
) -> DataFrame:
    """The k-core of the undirected simple graph: ``(node, degree)`` for
    every node of the maximal subgraph where ALL degrees are >= ``k``
    (degree = within-core degree).

    Spam/link-farm curation signal: dense cores survive peeling, organic
    link periphery does not.  Textbook iterative peel — drop nodes with
    degree < k, recompute degrees on the induced subgraph, repeat to
    fixpoint — expressed as a loop of two keyed aggregations + two
    semi-joins per round with ``localCheckpoint`` lineage cuts (the
    Pregel shape, like :func:`pagerank_integer`).  The result is unique
    (the k-core is well-defined) hence independent of peel order and
    partitioning.  Rounds needed = peel depth, typically tens; the
    convergence check is one cheap count per round.  Not expressible as
    a one-shot SQL oracle (the fixpoint is non-monotone), so the gate
    coverage is python-model + invariance pytests, like PCA.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = e.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n").localCheckpoint(
            eager=False
        )
        e2 = (
            e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n2 = e2.count()
        if n2 == n_edges:
            break
        e, n_edges = e2, n2
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= k)
    )
    return deg


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS hop distances on the undirected simple graph:
    ``(node, dist)`` for every node within ``max_hops`` of any source
    (``dist`` = minimum hop count; sources are dist 0) — the
    neighborhood-expansion primitive behind crawl-frontier scoping and
    contamination blast-radius queries.

    Level-synchronous Pregel shape, like :func:`pagerank_integer`: each
    round is one frontier⋈edges join + an anti-join against the settled
    set, with ``localCheckpoint`` lineage cuts; rounds = ``max_hops``
    (bounded, not a data-dependent fixpoint), so the oracle replays the
    SAME levels as unrolled CTEs and matches exactly.  Early-exits when
    a frontier empties.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
    )
    und = (
        und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = spark.createDataFrame(
        [(int(n), 0) for n in sorted(set(sources))], "node long, dist int"
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(
            nxt.withColumn("dist", F.lit(h).cast("int"))
        ).localCheckpoint(eager=False)
        frontier = nxt
    return dist


def bfs_distances_oracle_sql(
    edges_sql: str,
    sources: list[int],
    max_hops: int = 3,
) -> str:
    """ANSI twin of :func:`bfs_distances` — one CTE per BFS level.
    ``edges_sql`` must select columns ``(src, dst)``."""
    seeds = ", ".join(f"({int(n)})" for n in sorted(set(sources)))
    blocks = [
        f"""e0 AS ({edges_sql}),
e AS (
  SELECT u, v FROM (
    SELECT src AS u, dst AS v FROM e0 WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst
    UNION
    SELECT dst AS u, src AS v FROM e0 WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst
  )
),
d0 AS (SELECT CAST(t.node AS BIGINT) AS node, 0 AS dist FROM (VALUES {seeds}) t(node)),
seen0 AS (SELECT node FROM d0)"""
    ]
    for h in range(1, max_hops + 1):
        blocks.append(
            f"""l{h} AS (
  SELECT DISTINCT e.v AS node
  FROM seen{h - 1} f JOIN e ON e.u = f.node
  WHERE e.v NOT IN (SELECT node FROM (SELECT node FROM d0{"".join(f" UNION ALL SELECT node FROM l{i}" for i in range(1, h))}))
),
seen{h} AS (SELECT node FROM l{h})"""
        )
    union = "SELECT node, dist FROM d0" + "".join(
        f"\nUNION ALL SELECT node, {h} AS dist FROM l{h}" for h in range(1, max_hops + 1)
    )
    body = ",\n".join(blocks)
    return f"WITH {body}\n{union}".strip()


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
) -> DataFrame:
    """Global clustering coefficient (transitivity) of the undirected
    simple graph: one row ``(n_nodes, n_edges, n_wedges, n_triangles,
    global_cc)`` with ``global_cc = 3*triangles / wedges``.

    The one-number density fingerprint next to :func:`triangle_count`'s
    raw count: organic link graphs sit near their expected transitivity;
    link farms and scraped mirrors spike it.  Wedges ``sum d*(d-1)/2``
    and triangles are exact integers (degree-ordered orientation bounds
    the triangle join, see :func:`triangle_count`); the coefficient is
    one double division.  Cost = the triangle count plus one degree
    aggregation.
    """
    tri = triangle_count(edges, src, dst)
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges")
    )
    cc = F.when(
        F.col("n_wedges") > 0,
        F.round(
            (3 * F.col("n_triangles")).cast("double")
            / F.col("n_wedges").cast("double"),
            ndigits,
        ),
    )
    return tri.crossJoin(wed).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles", cc.alias("global_cc")
    )


def clustering_coefficient_oracle_sql(edges_sql: str, ndigits: int = 6) -> str:
    """ANSI twin of :func:`clustering_coefficient`."""
    tri = triangle_count_oracle_sql(edges_sql)
    return f"""
WITH t AS ({tri}),
raw2 AS ({edges_sql}),
e2 AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw2
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM e2 UNION ALL SELECT v AS n FROM e2
  ) GROUP BY n
),
wed AS (
  SELECT CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg
)
SELECT t.n_nodes, t.n_edges, wed.n_wedges, t.n_triangles,
       CASE WHEN wed.n_wedges > 0
            THEN ROUND(CAST(3 * t.n_triangles AS DOUBLE)
                       / CAST(wed.n_wedges AS DOUBLE), {ndigits}) END AS global_cc
FROM t CROSS JOIN wed
""".strip()


def adamic_adar_topk(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top: int = 25,
    max_degree: int | None = None,
    scale: int = 10**6,
) -> DataFrame:
    """Adamic–Adar link prediction over the undirected simple graph:
    the ``top`` non-adjacent node pairs ranked by
    ``AA(x,y) = sum over common neighbors v of 1/ln(deg(v))`` — the
    classic common-neighbor score that discounts hub-mediated
    co-occurrence (a shared neighbor of degree 2 is strong evidence; a
    shared hub of degree 10^6 is none).  Output
    ``(x, y, cn, score_micro, aa)`` with ``x < y``, ``cn`` the
    common-neighbor count, ``score_micro`` the exact BIGINT sum of the
    per-neighbor weights ``floor(scale / ln(deg(v)))``, and ``aa`` the
    display-scale double.  Ranking ties break on ``(x, y)`` so the
    top-k is deterministic.

    **Exactness** — each common neighbor's weight is floor-quantized to
    an integer BEFORE summation (the micro-nat trick shared with the
    PMI/entropy/JSD operators), so scores are BIGINT sums with no
    float-summation order and the ranking replays in any engine.
    Degree-1 nodes have no neighbor pairs; degree filtering makes
    ``ln(deg) > 0`` structural.

    **Scale** — the neighbor-pair fan-out of a center node is
    ``deg^2``: on a power-law graph the hubs dominate the join.
    ``max_degree`` caps it (mirrored in the oracle): centers above the
    cap are skipped, which is the standard mitigation because their
    per-pair weight ``1/ln(deg)`` is the smallest in the graph.  With a
    cap ``d``, work is bounded by ``|V| * d^2`` regardless of skew —
    set it (e.g. 1000) for web-scale link graphs.  Existing edges are
    removed with a left-anti join on the canonical pair.
    """
    if top < 1 or scale < 1 or (max_degree is not None and max_degree < 2):
        raise ValueError("top/scale must be >= 1; max_degree >= 2")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    nbrs = e.select(F.col("u").alias("c"), F.col("v").alias("n")).unionAll(
        e.select(F.col("v").alias("c"), F.col("u").alias("n"))
    )
    deg = nbrs.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.where(F.col("d") >= 2)
    if max_degree is not None:
        centers = centers.where(F.col("d") <= max_degree)
    w = centers.select(
        "c", F.floor(F.lit(scale) / F.log(F.col("d").cast("double"))).cast("long").alias("w")
    )
    wn = nbrs.join(w, "c")
    a = wn.select("c", "w", F.col("n").alias("x"))
    b = wn.select("c", F.col("n").alias("y"))
    pairs = a.join(b, "c").where(F.col("x") < F.col("y"))
    scores = pairs.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("cn"), F.sum("w").alias("score_micro")
    )
    cand = scores.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"], "left_anti"
    )
    out = cand.select(
        "x",
        "y",
        "cn",
        "score_micro",
        F.round(F.col("score_micro").cast("double") / scale, 6).alias("aa"),
    )
    return out.orderBy(F.desc("score_micro"), "x", "y").limit(top)


def adamic_adar_topk_oracle_sql(
    edges_sql: str,
    top: int = 25,
    max_degree: int | None = None,
    scale: int = 10**6,
) -> str:
    """ANSI twin of :func:`adamic_adar_topk` (same canonical edges,
    same floor-quantized integer weights, same tie-break)."""
    cap = f"AND d <= {max_degree}" if max_degree is not None else ""
    return f"""
WITH raw AS ({edges_sql}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
nbrs AS (
  SELECT u AS c, v AS n FROM e UNION ALL SELECT v AS c, u AS n FROM e
),
w AS (
  SELECT c, CAST(FLOOR({scale} / LN(CAST(d AS DOUBLE))) AS BIGINT) AS w
  FROM (SELECT c, COUNT(*) AS d FROM nbrs GROUP BY c)
  WHERE d >= 2 {cap}
),
pairs AS (
  SELECT a.n AS x, b.n AS y, w.w
  FROM nbrs a JOIN nbrs b ON a.c = b.c AND a.n < b.n
  JOIN w ON w.c = a.c
),
scores AS (
  SELECT x, y, COUNT(*) AS cn, CAST(SUM(w) AS BIGINT) AS score_micro
  FROM pairs GROUP BY x, y
),
cand AS (
  SELECT s.* FROM scores s
  ANTI JOIN e ON e.u = s.x AND e.v = s.y
)
SELECT x, y, cn, score_micro,
       ROUND(CAST(score_micro AS DOUBLE) / {scale}, 6) AS aa
FROM cand
ORDER BY score_micro DESC, x, y
LIMIT {top}
""".strip()


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    scale: int = 10**6,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the directed
    simple graph: ``(node, hub, auth)`` after ``iters`` exact integer
    iterations of the mutual recursion

    ``auth(v) = sum of hub(u) over in-edges (u,v)``
    ``hub(u)  = sum of auth(v) over out-edges (u,v)``

    each half-step max-normalized to ``scale`` by the integer division
    ``floor(x * scale / max(x))`` — max is an exact aggregate (unlike
    the usual L2 norm's sqrt), so every score is deterministic BIGINT
    in [0, scale] and the iteration replays in any engine.  Hubs are
    pages that link to many authorities; authorities are pages linked
    from many hubs — the second classic link-quality signal next to
    :func:`pagerank_integer`, and the one that separates directories
    from destinations (PageRank conflates them).

    **Scale** — per iteration: two keyed join+agg rounds over the edge
    list plus one scalar max; lineage is cut per iteration
    (``localCheckpoint``) exactly like :func:`pagerank_integer`.
    Overflow bound: ``x <= scale * max_degree``, so the normalization
    product needs ``scale^2 * max_degree < 2^63`` — the default 1e6
    supports degrees to ~9e6; drop ``scale`` to 1e4 for web-scale hubs
    (degree ~9e10).  Self-loops drop (a page is not its own endorser).
    """
    if iters < 1 or scale < 2:
        raise ValueError("iters >= 1 and scale >= 2 required")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hub = nodes.withColumn("h", F.lit(int(scale)).cast("long"))
    auth = None
    # Each half-step materializes (eager localCheckpoint) and collects ONE
    # scalar — the max, same driver-side footprint as pagerank_integer's
    # node count.  Keeping the normalizer on the driver keeps the plan
    # depth constant per iteration instead of nesting broadcast subplans.
    for _ in range(iters):
        a_all = (
            nodes.join(
                e.join(hub, e["src"] == hub["node"])
                .groupBy("dst")
                .agg(F.sum("h").alias("x")),
                nodes["node"] == F.col("dst"),
                "left",
            )
            .select("node", F.coalesce("x", F.lit(0).cast("long")).alias("x"))
            # lazy: the max aggregate right below materializes the
            # checkpoint in ITS job — one job per half-step, not two
            .localCheckpoint(eager=False)
        )
        am = a_all.agg(F.max("x")).collect()[0][0]
        if am is None:
            # no edges survived the null/self-loop filtering: the node set
            # is empty and the normalizer has nothing to divide by
            raise ValueError(
                "hits_scores: edge set is empty after filtering "
                "(nulls and self-loops are dropped)"
            )
        auth = a_all.select(
            "node", F.expr(f"(x * {int(scale)}) div {int(am)}").alias("a")
        )
        h_all = (
            nodes.join(
                e.join(auth, e["dst"] == auth["node"])
                .groupBy("src")
                .agg(F.sum("a").alias("x")),
                nodes["node"] == F.col("src"),
                "left",
            )
            .select("node", F.coalesce("x", F.lit(0).cast("long")).alias("x"))
            # lazy for the same reason as a_all above
            .localCheckpoint(eager=False)
        )
        hm = h_all.agg(F.max("x")).collect()[0][0]
        hub = h_all.select(
            "node", F.expr(f"(x * {int(scale)}) div {int(hm)}").alias("h")
        )
    return (
        nodes.join(hub, "node")
        .join(auth, "node")
        .select("node", F.col("h").alias("hub"), F.col("a").alias("auth"))
    )


def hits_scores_oracle_sql(
    edges_sql: str,
    iters: int = 4,
    scale: int = 10**6,
) -> str:
    """ANSI twin of :func:`hits_scores`: the same max-normalized integer
    iterations unrolled as chained CTEs."""
    s = int(scale)
    # AS MATERIALIZED is load-bearing: each level is referenced more
    # than once (by the next level AND by its own MAX normalizer), so an
    # inlining planner would expand the unrolled chain exponentially.
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})",
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        " nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        f" h0 AS (SELECT node, CAST({s} AS BIGINT) AS h FROM nodes)",
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(
            f", ar{i} AS MATERIALIZED (SELECT n.node, COALESCE(s.x, 0) AS x"
            f"  FROM nodes n LEFT JOIN ("
            f"    SELECT e.dst AS node, SUM({prev_h}.h) AS x"
            f"    FROM e JOIN {prev_h} ON e.src = {prev_h}.node GROUP BY 1"
            f"  ) s ON n.node = s.node)"
            f", a{i} AS MATERIALIZED (SELECT node,"
            f"  CAST((x * {s}) // (SELECT MAX(x) FROM ar{i}) AS BIGINT) AS a"
            f"  FROM ar{i})"
            f", hr{i} AS MATERIALIZED (SELECT n.node, COALESCE(s.x, 0) AS x"
            f"  FROM nodes n LEFT JOIN ("
            f"    SELECT e.src AS node, SUM(a{i}.a) AS x"
            f"    FROM e JOIN a{i} ON e.dst = a{i}.node GROUP BY 1"
            f"  ) s ON n.node = s.node)"
            f", h{i} AS MATERIALIZED (SELECT node,"
            f"  CAST((x * {s}) // (SELECT MAX(x) FROM hr{i}) AS BIGINT) AS h"
            f"  FROM hr{i})"
        )
        prev_h = f"h{i}"
    parts.append(
        f" SELECT n.node, h{iters}.h AS hub, a{iters}.a AS auth"
        f" FROM nodes n JOIN h{iters} ON n.node = h{iters}.node"
        f" JOIN a{iters} ON n.node = a{iters}.node"
    )
    return "\n".join(parts)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected simple graph: ``(node, label)`` after ``iters`` rounds of
    every node adopting its neighbors' most frequent label, ties broken
    by the SMALLEST label — fully deterministic (the usual random order
    is what makes vanilla LPA irreproducible; synchronous + min-label
    replays in any engine).  Labels start as node ids; isolated-in-round
    nodes keep their label.  Communities are denser-than-CC structure:
    on one connected blob :func:`~ddspark.pipeline.dedup.connected_components`
    returns a single id while LPA still splits it along sparse cuts.

    **Scale** — one neighbor-join + one (node, label) count + one
    top-1-per-node window per round, lineage cut per round.  Fixed
    ``iters`` (synchronous LPA may oscillate on bipartite structure;
    bounded rounds are the standard mitigation and keep the oracle an
    exact per-round CTE unroll).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nbrs = e.select(F.col("u").alias("n"), F.col("v").alias("m")).unionAll(
        e.select(F.col("v").alias("n"), F.col("u").alias("m"))
    ).localCheckpoint(eager=False)
    nodes = nbrs.select("n").distinct().localCheckpoint(eager=False)
    labels = nodes.withColumn("label", F.col("n"))
    w = Window.partitionBy("n").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iters):
        cnt = (
            nbrs.join(labels.withColumnRenamed("n", "m"), "m")
            .groupBy("n", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("n", "label")
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("n").alias("node"), "label")


def label_propagation_oracle_sql(
    edges_sql: str,
    iters: int = 4,
) -> str:
    """ANSI twin of :func:`label_propagation` (same synchronous rounds,
    same (count desc, label asc) tie-break; MATERIALIZED per round)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v",
        f" FROM ({edges_sql})",
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        " nbrs AS MATERIALIZED (SELECT u AS n, v AS m FROM e UNION ALL SELECT v, u FROM e),",
        " l0 AS (SELECT DISTINCT n, n AS label FROM nbrs)",
    ]
    prev = "l0"
    for i in range(1, iters + 1):
        parts.append(
            f", l{i} AS MATERIALIZED ("
            f"  SELECT n, label FROM ("
            f"    SELECT nbrs.n, {prev}.label, COUNT(*) AS c,"
            f"           ROW_NUMBER() OVER (PARTITION BY nbrs.n"
            f"             ORDER BY COUNT(*) DESC, {prev}.label) AS rn"
            f"    FROM nbrs JOIN {prev} ON {prev}.n = nbrs.m"
            f"    GROUP BY nbrs.n, {prev}.label"
            f"  ) WHERE rn = 1)"
        )
        prev = f"l{i}"
    parts.append(f" SELECT n AS node, label FROM {prev}")
    return "\n".join(parts)
