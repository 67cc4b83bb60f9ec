"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [--json=PATH] [query ...]

--json=PATH additionally writes a driver-shaped record (one entry per
checked query: rows_match/schema_match/hash_match/spark_rows/
oracle_rows/err) so a FULL-contract run can be committed alongside the
driver's own CORRECTNESS file as a self-contained correctness record
(round-4 verdict item 4).
"""

from __future__ import annotations

import datetime
import math
import sys

sys.path.insert(0, "/root/repo")

_args = sys.argv[1:]
JSON_OUT = None
for a in list(_args):
    if a.startswith("--json="):
        JSON_OUT = a.split("=", 1)[1]
        _args.remove(a)
SF = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (datetime.datetime,)):
        if v != v:
            return "NULL"  # pandas NaT (the .df() path's NULL timestamp)
        if hasattr(v, "to_pydatetime"):
            # pandas Timestamp raises on naive astimezone(); stdlib datetime
            # assumes local tz, which is what the fetchall path relied on
            v = v.to_pydatetime()
        # Spark collect() yields naive datetimes in HOST-LOCAL time while
        # DuckDB (TimeZone=UTC) yields UTC-aware ones: normalize BOTH to
        # naive UTC (astimezone() on a naive value assumes the local tz),
        # so the compare holds on non-UTC hosts too
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None).isoformat()
    if isinstance(v, (datetime.date,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "tolist") and getattr(v, "ndim", None) == 1:
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok, bad, rows_only = [], [], []
    record: dict[str, dict] = {}

    def rec(name, *, spark_rows=None, oracle_rows=None, rows_match=False,
            schema_match=False, hash_match=False, err=None):
        record[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            msg = f"SPARK ERROR: {type(e).__name__}: {e}"
            bad.append((name, msg))
            rec(name, err=msg[:500])
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            rec(name, spark_rows=len(srows), err="rows-only: no oracle")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            # fetch through pandas (.df()) like the driver's canonicalizer,
            # NOT fetchall(): DuckDB HUGEINT aggregates become float64 under
            # pandas and only this path reveals the resulting hash drift
            # (round-2 sessionize_events root cause)
            dpdf = cur.df()
            drows = [tuple(row) for row in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            msg = f"DUCKDB ERROR: {type(e).__name__}: {e}"
            bad.append((name, msg))
            rec(name, spark_rows=len(srows), err=msg[:500])
            continue
        if sorted(scols) != sorted(dcols):
            bad.append((name, f"SCHEMA: spark={sorted(scols)} duck={sorted(dcols)}"))
            rec(name, spark_rows=len(srows), oracle_rows=len(drows),
                rows_match=len(srows) == len(drows),
                err=f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            bad.append((name, f"ROWCOUNT: spark={len(srows)} duck={len(drows)}"))
            rec(name, spark_rows=len(srows), oracle_rows=len(drows),
                schema_match=True, err="row count mismatch")
            continue
        sset = rowset(scols, [[r[c] for c in scols] for r in srows])
        dset = rowset(dcols, drows)
        if sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            bad.append((name, f"VALUES: first diffs {diff}"))
            rec(name, spark_rows=len(srows), oracle_rows=len(drows),
                rows_match=True, schema_match=True,
                err=f"value mismatch: first diffs {diff}"[:500])
            continue
        ok.append((name, len(srows)))
        rec(name, spark_rows=len(srows), oracle_rows=len(drows),
            rows_match=True, schema_match=True, hash_match=True)

    print(f"\n=== ORACLE CHECK @ {SF} ===")
    for name, n in ok:
        print(f"  OK        {name} ({n} rows)")
    for name, n in rows_only:
        print(f"  ROWS-ONLY {name} ({n} rows)")
    for name, msg in bad:
        print(f"  FAIL      {name}: {msg[:300]}")
    print(f"\n{len(ok)} ok, {len(rows_only)} rows-only, {len(bad)} fail")
    if JSON_OUT:
        import json
        with open(JSON_OUT, "w") as f:
            json.dump(record, f, indent=1)
        print(f"record written to {JSON_OUT}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
