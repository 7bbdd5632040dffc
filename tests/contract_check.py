"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each contract query: run the Spark callable and the DuckDB oracle on the
same sf dir, then compare (row count, sorted column names, order-insensitive
value hash). Usable as a library (pytest) or a CLI:

    python tests/contract_check.py [sf_dir] [query ...]

Canonicalization is DRIVER-FAITHFUL (VERDICT r2 fix #2): both engines'
results are pulled through pandas (Spark ``.toPandas()``, DuckDB
``.fetchdf()``) and cells are rendered dtype-faithfully — a Spark
``Decimal('49746.0000')`` and a DuckDB float64 ``49746.0`` hash DIFFERENTLY,
exactly as the driver's canonicalizer sees them. The previous normalizer
(`str()` on raw ``collect()``/``fetchall()`` values + ``%.6g`` floats) masked
that divergence twice (r1 HUGEINT, r2 trailing-zero DECIMAL); floats now
render at full shortest-round-trip precision (``repr``), so 7th-digit drift
is no longer forgiven either.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

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
    """Dtype-faithful cell rendering over pandas-materialized values.

    Floats use ``repr`` (shortest round-trip — no %.6g forgiveness);
    Decimals use ``str`` (keeps trailing zeros, so Decimal vs float64
    mismatches are VISIBLE, like the driver); containers recurse."""
    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "nan" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
        return str(v)
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_lines(df: pd.DataFrame) -> list[str]:
    """Order-insensitive canonical row strings: columns sorted by name,
    cells rendered dtype-faithfully, rows sorted."""
    cols = sorted(df.columns)
    sub = df[cols]
    lines = [
        "\x1f".join(_norm_cell(v) for v in row)
        for row in sub.itertuples(index=False, name=None)
    ]
    return sorted(lines)


def frame_fingerprint(df: pd.DataFrame) -> str:
    return hashlib.md5("\n".join(frame_lines(df)).encode()).hexdigest()


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> dict:
    spdf = fn(spark, sf_dir).toPandas()
    ddf = con.execute(sql).fetchdf()
    out = {
        "name": name,
        "rows": (len(spdf), len(ddf)),
        "cols": (sorted(spdf.columns), sorted(ddf.columns)),
        "rows_match": len(spdf) == len(ddf),
        "cols_match": sorted(spdf.columns) == sorted(ddf.columns),
    }
    out["hash_match"] = (
        out["rows_match"]
        and out["cols_match"]
        and frame_fingerprint(spdf) == frame_fingerprint(ddf)
    )
    if not out["hash_match"] and out["cols_match"]:
        ss, dd = frame_lines(spdf), frame_lines(ddf)
        diffs = [(a, b) for a, b in zip(ss, dd) if a != b]
        out["first_diffs"] = diffs[:3]
        out["only_spark"] = sorted(set(ss) - set(dd))[:3]
        out["only_duck"] = sorted(set(dd) - set(ss))[:3]
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
        print(f"{name:28s} {status} rows={r['rows']} cols_match={r['cols_match']}", flush=True)
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
