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

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank_integer", "pagerank_oracle_sql"]


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
