"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given SF dir, comparing row count, schema (sorted column names) and
an order-insensitive value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows: list[dict]) -> str:
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        return str(v)

    lines = sorted(",".join(cell(r[k]) for k in sorted(r)) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from llama_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d}  (no oracle — rows-only) {t_spark:6.1f}s")
            continue
        t0 = time.time()
        ddf = con.execute(oracles[name]).fetch_arrow_table()
        drows = ddf.to_pylist()
        t_duck = time.time() - t0
        s_cols = sorted(sdf.columns)
        d_cols = sorted(ddf.column_names)
        ok_rows = len(srows) == len(drows)
        ok_schema = s_cols == d_cols
        ok_hash = canon(srows) == canon(drows) if ok_schema else False
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status} rows={len(srows)}/{len(drows)} "
            f"schema={'=' if ok_schema else f'{s_cols}!={d_cols}'} "
            f"hash={'=' if ok_hash else 'X'} spark={t_spark:5.1f}s duck={t_duck:5.1f}s"
        )
        if not ok_hash and ok_schema and ok_rows:
            sset = {tuple(sorted(r.items())) for r in srows}
            dset = {tuple(sorted(r.items())) for r in drows}
            diff_s = list(sset - dset)[:3]
            diff_d = list(dset - sset)[:3]
            print(f"    spark-only: {diff_s}")
            print(f"    duck-only:  {diff_d}")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
