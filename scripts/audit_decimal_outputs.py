"""Audit: flag every contract query whose OUTPUT schema contains a DECIMAL
column on either engine (Spark DecimalType / DuckDB DECIMAL-HUGEINT). These
are the trailing-zero driver-red class from VERDICT r2 — final selects must
cast to DOUBLE in BOTH engines.

Usage: python scripts/audit_decimal_outputs.py [sf_dir]
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import duckdb  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from contract_check import duck_connection  # noqa: E402
from crawl4ai_scraper_spark.session import build_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="decimal-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    flagged = []
    for name, fn in sorted(qs.items()):
        hits = []
        try:
            sdf = fn(spark, sf_dir)
            for f in sdf.schema.fields:
                if isinstance(f.dataType, T.DecimalType):
                    hits.append(f"spark:{f.name}:{f.dataType.simpleString()}")
        except Exception as exc:
            hits.append(f"spark-ERROR:{type(exc).__name__}")
        if name in oq:
            try:
                rel = con.sql(oq[name].replace("$SF", sf_dir))
                for cname, ctype in zip(rel.columns, rel.types):
                    ts = str(ctype)
                    if "DECIMAL" in ts or "HUGEINT" in ts:
                        hits.append(f"duck:{cname}:{ts}")
            except Exception as exc:
                hits.append(f"duck-ERROR:{type(exc).__name__}:{str(exc)[:120]}")
        if hits:
            flagged.append((name, hits))
            print(f"{name:32s} {hits}")
    print(f"\n{len(flagged)} queries with DECIMAL/HUGEINT outputs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
