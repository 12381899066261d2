"""Self-check: run every QUERIES entry on Spark and its ORACLES twin on
DuckDB over the same parquet tables; compare row count, column names,
and exact sorted values — a local rehearsal of the driver's
CORRECTNESS gate.

Usage: python scripts/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

With ``--json OUT.json`` the per-query results are also written in the
driver's CORRECTNESS artifact shape (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err) — hash_match here means an
exact sorted-value comparison, which is strictly stronger than the
driver's value-hash.
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, ".")

from grass_spark.queries import ORACLES, QUERIES  # noqa: E402
from grass_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
        return float(v)  # Decimal
    if isinstance(v, bool):
        return bool(v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=16)

    failures = []
    results = {}

    def record(name, rows=None, oracle_rows=None, ok=None, err=None):
        results[name] = {
            "rows_match": ok, "schema_match": ok, "hash_match": ok,
            "spark_rows": rows, "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLES:
            # rows-only query (no SQL-expressible oracle): just run it
            try:
                n = len(fn(spark, sf_dir).collect())
                print(f"OK   {name}: {n} rows (rows-only, no oracle)")
                record(name, rows=n, err="no_oracle")
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                record(name, ok=False, err=f"{type(e).__name__}: {e}")
                print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {e}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.execute(ORACLES[name])
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record(name, ok=False, err=f"{type(e).__name__}: {e}")
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {e}")
            continue

        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            failures.append(name)
            record(name, rows=len(sr), oracle_rows=len(dr), ok=False,
                   err="schema_mismatch")
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            record(name, rows=len(sr), oracle_rows=len(dr), ok=False,
                   err="rowcount_mismatch")
            print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)}")
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            failures.append(name)
            record(name, rows=len(sr), oracle_rows=len(dr), ok=False,
                   err="value_mismatch")
            print(f"FAIL {name}: {len(bad)}/{len(sr)} value mismatches; first 3:")
            for a, b in bad[:3]:
                print(f"   spark : {a}\n   duckdb: {b}")
            continue
        record(name, rows=len(sr), oracle_rows=len(dr), ok=True)
        print(f"OK   {name}: {len(sr)} rows, cols={sc}")

    total = len(only) if only else len(QUERIES)
    print(f"\n{total - len(failures)}/{total} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": total,
                       "n_pass": total - len(failures),
                       "results": results}, f, indent=1)
        print(f"wrote {json_out}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
