"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compare row count, column names,
and values (column-name-sorted, order-insensitive).

Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        # The driver's hash is dtype-sensitive (BIGINT 42 != DOUBLE 42.0), so
        # an int-vs-float drift must fail here too, not be coerced away
        # (VERDICT r2: exact_stats + pack_sequences slipped through this gap).
        kind = lambda k: {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "other")
        if kind(av.dtype.kind) != kind(bv.dtype.kind):
            problems.append(
                f"col {col!r}: dtype kind differs: spark={av.dtype} duck={bv.dtype} "
                "(driver hash is dtype-sensitive — align casts on both sides)"
            )
            continue
        if av.dtype != bv.dtype and kind(av.dtype.kind) != "other":
            print(f"    warn {name} col {col!r}: same kind, width differs: "
                  f"spark={av.dtype} duck={bv.dtype}")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            exact = (av == bv) | both_nan
            if not exact.all():
                i = int(np.argmax(~exact))
                problems.append(
                    f"col {col!r}: {int((~exact).sum())} value diffs, e.g. "
                    f"spark={av[i]!r} duck={bv[i]!r} (absdiff={abs(av[i]-bv[i])!r})"
                )
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                problems.append(f"col {col!r}: non-numeric values differ")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from ddspark.session import get_spark

    spark = get_spark(app_name="check-oracles", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark query raised {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match")
    # smoke entry()
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows")
    if n <= 0:
        failures += 1
    print(f"SUMMARY: {len(qs)} queries, {failures} failures, sf_dir={sf_dir}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
