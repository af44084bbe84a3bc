"""Local simulation of the driver's correctness harness: run each
__spark_entry__.queries()[name] at a given sf and compare against
oracle_sql()[name] via DuckDB — row count, schema (column names), and
order-insensitive value hash.

Usage: python tools/check_entry.py [sf_dir] [name ...]
(names filter the checked entries; default = all)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from mongo2neo_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows, cols={cols} ({dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failed.append(name)
            continue
        scols = [c.lower() for c in cols]
        ok_schema = sorted(scols) == sorted(ocols)
        ok_count = len(rows) == len(orows)
        ok_hash = value_hash(rows, scols) == value_hash(orows, ocols)
        status = "OK   " if (ok_schema and ok_count and ok_hash) else "FAIL "
        print(
            f"{status} {name}: rows {len(rows)}/{len(orows)} "
            f"schema={'=' if ok_schema else sorted(scols)} "
            f"hash={'=' if ok_hash else 'MISMATCH'} ({dt:.1f}s)"
        )
        if status.startswith("FAIL"):
            failed.append(name)
    # smoke: entry()
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
