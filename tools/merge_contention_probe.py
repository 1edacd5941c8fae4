"""Multi-writer MERGE contention probe (round 8, r7 verdict item 7).

N OS processes concurrently MERGE disjoint key slices whose rows
interleave within every data file of a shared ACID table — maximal
file-CoW contention: every commit rewrites files the other writers
planned against, so all but one writer per round loses the os.link
race, reclaims its rewrite, and REPLAYS against the new snapshot.

For N in {2, 4, 8}: reports wall time, total conflict retries, and
committed-merges/sec, and asserts no lost updates (every writer's
upsert present exactly once).  Appends nothing; print-only — the
SCALING.md table is written from this output.

Usage: python tools/merge_contention_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# reuse the pytest's writer verbatim — one definition of the protocol
sys.path.insert(0, os.path.join(REPO, "tests"))
from test_acid import _MERGE_WRITER  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from morphl_model_user_search_intent_spark.sources.acid import (
        create_table,
        list_versions,
        read_table,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_keys = 8192
    for n_writers in (2, 4, 8):
        root = f"/tmp/merge-contention-{n_writers}"
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        base = spark.createDataFrame(
            [(k, "BASE", 0.0) for k in range(n_keys)],
            "o_orderkey bigint, o_orderpriority string, price double",
        )
        create_table(spark, root, base.repartition(8))
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _MERGE_WRITER, root, str(w),
                 str(n_writers)],
                stdout=subprocess.PIPE,
                text=True,
            )
            for w in range(n_writers)
        ]
        retries = 0
        for p in procs:
            out, _ = p.communicate(timeout=600)
            assert p.returncode == 0
            retries += json.loads(out.strip().splitlines()[-1])["retries"]
        wall = time.perf_counter() - t0
        rows = {
            r.o_orderkey: r for r in read_table(spark, root).collect()
        }
        lost = [
            k
            for k in range(n_keys)
            if rows[k].o_orderpriority != f"W{k % n_writers}"
            or rows[k].price != k * 10.0 + (k % n_writers) + 1
        ]
        assert not lost, f"{n_writers} writers lost updates: {lost[:5]}"
        assert len(rows) == n_keys
        n_versions = len(list_versions(root))
        print(
            json.dumps(
                {
                    "writers": n_writers,
                    "wall_s": round(wall, 2),
                    "conflict_retries": retries,
                    "merges_per_s": round(n_writers / wall, 2),
                    "versions": n_versions,
                    "lost_updates": 0,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
