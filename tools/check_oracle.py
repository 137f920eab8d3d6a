"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
twin exists, the same query on DuckDB over the sf0.01 parquet views;
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(col.iloc[0], (list, tuple)):
            df[c] = col.map(lambda v: ",".join(map(str, v)))
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6)
    if len(df) == 0:
        return "empty:" + ",".join(df.columns)
    rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # the er_resolve oracle embeds a reference-cluster dim computed from a
    # concrete sf dir — point it at the one being checked
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from nilinker_spark.config import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:24s} spark error: {exc}")
            continue
        finally:
            # corpus operators persist multi-consumer intermediates and
            # hand ownership out (corpus.release_caches); a 50-query
            # session would otherwise accumulate cacheManager entries
            from nilinker_spark.operators.corpus import release_caches

            release_caches()
        dt = time.monotonic() - t0
        if name not in osql:
            print(f"rows  {name:24s} {len(sdf):8d} rows  {dt:5.1f}s (no oracle — rows-only)")
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:24s} duckdb error: {exc}")
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name:24s} rows {len(sdf):6d}/{len(ddf):<6d} cols={ok_cols} hash={ok_hash}  {dt:5.1f}s"
        )
        if not ok_hash and ok_rows and ok_cols and len(sdf) > 0:
            merged = sdf.sort_values(sorted(sdf.columns)[0]).head(3)
            print("  spark sample:\n", merged.to_string())
            print("  duckdb sample:\n", ddf.sort_values(sorted(ddf.columns)[0]).head(3).to_string())
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
