"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs every entry of gh_crawler_spark.queries.QUERIES at sf0.01: the Spark
DataFrame and the DuckDB oracle side-by-side, comparing row count, sorted
column names, and exact cell values after canonical ordering. Strict on
purpose — if this passes, the driver's value-hash compare should too.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                av = av.astype(float).round(9)
                bv = bv.astype(float).round(9)
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            else:
                neq = ~((av.astype(str) == bv.astype(str)))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                                f"spark={a[c][i]!r} duck={b[c][i]!r}")
    return problems


def main() -> int:
    from gh_crawler_spark.queries import QUERIES, TABLES
    from gh_crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    spark = get_spark("check_oracles", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_fail = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(spdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name} ({len(spdf)} rows)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
