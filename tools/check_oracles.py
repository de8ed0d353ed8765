"""Driver-style correctness harness: run every __spark_entry__ query
against its DuckDB oracle and compare row-count + schema + order-
insensitive values (columns sorted by name, rows sorted, stringified).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from jsonld_spark.plans.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(lambda v: "NULL" if v is None else str(v))
    return out.sort_values(cols).reset_index(drop=True), cols


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        app_name="oracle-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} SPARK ERROR: {exc}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:32s} rows={len(sdf):7d} (no oracle — rows-only) {time.time()-t0:5.1f}s")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ORACLE ERROR: {exc}")
            failures.append(name)
            continue
        a, acols = normalize(sdf)
        b, bcols = normalize(odf)
        if acols != bcols:
            print(f"{name:32s} SCHEMA MISMATCH spark={acols} oracle={bcols}")
            failures.append(name)
            continue
        if len(a) != len(b):
            print(f"{name:32s} ROWCOUNT MISMATCH {len(a)} vs {len(b)}")
            failures.append(name)
            continue
        if not a.equals(b):
            diff = a.merge(b, how="outer", indicator=True)
            diff = diff[diff["_merge"] != "both"]
            print(f"{name:32s} VALUE MISMATCH ({len(diff)} differing rows)")
            print(diff.head(6).to_string())
            failures.append(name)
            continue
        print(f"{name:32s} rows={len(a):7d} MATCH {time.time()-t0:5.1f}s")

    ran = len([n for n in queries if not only or n in only])
    print(f"\n{ran - len(failures)}/{ran} queries match")
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
