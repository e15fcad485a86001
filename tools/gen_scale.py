"""Deterministic N-x scale-up of the driver testdata for the large-scale
gate run (VERDICT r3 #6: catch overflow/int-width drift that only appears
at bigger counts — the r2 dtype bugs were scale-independent luck).

Fact tables are replicated ``factor`` times with disjoint id ranges;
replica documents get a per-replica text suffix (``n_chars`` recomputed) so
dedup pipelines don't quadratically explode on cross-replica exact dups,
and replica embeddings are perturbed by ``r * 1e-4`` so cosine rankings
have no cross-replica ties.  Dimension tables copy as-is (TPC-H dims don't
scale either).  Pure DuckDB SQL over the source parquet — same bytes on
every run.

Usage::

    python tools/gen_scale.py [src_dir] [dst_dir] [factor]
    # defaults: /root/testdata/sf0.1  /tmp/ddspark_sf1  10
    python tools/check_oracles.py /tmp/ddspark_sf1   # the 10x gate

The generated dir serves the same table names as the driver's sf dirs, so
``check_oracles.py`` (Spark vs DuckDB over identical parquet) runs
unchanged.
"""

from __future__ import annotations

import os
import sys

import duckdb

# far above any real key in the source tables, far below 2^53
OFFSET = 100_000_000

DIMS = ["region", "nation", "customer", "supplier", "part"]


def replicate_sql(src: str, table: str, factor: int) -> str:
    base = f"SELECT * FROM '{src}/{table}.parquet'"
    parts = [base]
    for r in range(1, factor):
        off = r * OFFSET
        if table == "orders":
            sel = (
                f"SELECT o_orderkey + {off} AS o_orderkey, o_custkey, "
                "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
                f"FROM '{src}/orders.parquet'"
            )
        elif table == "lineitem":
            sel = (
                f"SELECT l_orderkey + {off} AS l_orderkey, l_partkey, "
                "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
                f"FROM '{src}/lineitem.parquet'"
            )
        elif table == "events":
            sel = (
                f"SELECT event_id + {off} AS event_id, ts, user_id, "
                f"event_type, value, props FROM '{src}/events.parquet'"
            )
        elif table == "documents":
            sel = (
                f"SELECT doc_id + {off} AS doc_id, "
                f"text || ' r{r}' AS text, lang, source, "
                f"CAST(length(text || ' r{r}') AS BIGINT) AS n_chars "
                f"FROM '{src}/documents.parquet'"
            )
        elif table == "embeddings":
            sel = (
                f"SELECT vec_id + {off} AS vec_id, "
                f"list_transform(embedding, x -> CAST(x + {r} * 1e-4 AS FLOAT)) "
                f"AS embedding, label FROM '{src}/embeddings.parquet'"
            )
        else:
            raise ValueError(table)
        parts.append(sel)
    return " UNION ALL ".join(parts)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ddspark_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
            print(f"{t}: copied")
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"COPY ({replicate_sql(src, t, factor)}) TO '{dst}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
