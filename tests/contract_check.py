"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each contract query: run the Spark callable and the DuckDB oracle on the
same sf dir, then compare (row count, sorted column names, order-insensitive
value hash). Usable as a library (pytest) or a CLI:

    python tests/contract_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_fingerprint(cols, rows):
    """Order-insensitive value hash: sort columns by name, normalize cells,
    hash the sorted multiset of row strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    digest = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return digest


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    out = {
        "name": name,
        "rows": (len(srows), len(drows)),
        "cols": (sorted(scols), sorted(dcols)),
        "rows_match": len(srows) == len(drows),
        "cols_match": sorted(scols) == sorted(dcols),
    }
    out["hash_match"] = (
        out["rows_match"]
        and out["cols_match"]
        and frame_fingerprint(scols, srows) == frame_fingerprint(dcols, drows)
    )
    if not out["hash_match"] and out["cols_match"]:
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ss = sorted("\x1f".join(_norm_cell(r[i]) for i in order_s) for r in srows)
        dd = sorted("\x1f".join(_norm_cell(r[i]) for i in order_d) for r in drows)
        diffs = [(a, b) for a, b in zip(ss, dd) if a != b]
        only_s = sorted(set(ss) - set(dd))[:3]
        only_d = sorted(set(dd) - set(ss))[:3]
        out["first_diffs"] = diffs[:3]
        out["only_spark"] = only_s
        out["only_duck"] = only_d
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from crawl4ai_scraper_spark.session import build_session

    spark = build_session(app_name="contract-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name not in oq:
            n = fn(spark, sf_dir).count()
            print(f"{name:28s} rows-only: {n}")
            continue
        try:
            r = compare_query(spark, con, name, fn, oq[name], sf_dir)
        except Exception as exc:  # show which side exploded
            print(f"{name:28s} ERROR: {type(exc).__name__}: {str(exc)[:300]}")
            failures.append(name)
            continue
        status = "OK " if r["hash_match"] else "FAIL"
        print(f"{name:28s} {status} rows={r['rows']} cols_match={r['cols_match']}")
        if not r["hash_match"]:
            failures.append(name)
            for key in ("first_diffs", "only_spark", "only_duck"):
                if r.get(key):
                    print(f"   {key}: {r[key]}")
            if not r["cols_match"]:
                print(f"   cols: {r['cols']}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
