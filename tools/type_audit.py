"""Plan-only cross-engine column-type parity audit.

For every oracle-checked registry query: build the Spark plan (no
execution), bind the DuckDB oracle (no execution), and compare
per-column pandas-hash type classes via
``tools.driver_sim.type_parity_violations``.  This sweeps all ~360
pairs in a few minutes and catches the dtype-hash failure class
(r1 HUGEINT, r3 q_math_funcs LONG-vs-DOUBLE) that value-multiset
comparison is structurally blind to.

Usage: python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.driver_sim import TABLES, type_parity_violations  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    flagged = 0
    t_start = time.perf_counter()
    for i, (name, sql) in enumerate(oracles.items()):
        try:
            df = qs[name](spark, SF_DIR)
            bad = type_parity_violations(df, con, sql)
        except Exception as ex:  # noqa: BLE001
            bad = [f"ERR {type(ex).__name__}: {ex}"]
        if bad:
            flagged += 1
            print(f"  FLAG {name}: {bad}")
        if (i + 1) % 50 == 0:
            print(
                f"  ... {i + 1}/{len(oracles)} audited "
                f"({time.perf_counter() - t_start:.0f}s)"
            )
    print(
        f"{len(oracles)} oracle pairs audited, {flagged} flagged "
        f"({time.perf_counter() - t_start:.0f}s)"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
