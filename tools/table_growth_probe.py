"""Round-8 growth probe: warm walls of the NEW table/index OPERATIONS
(not the staged exercise keys, whose first run includes one-time
staging) at sf0.1 vs the 10x-amplified scale10x fixture.

Measures, per scale factor:
- merge_table_partitioned: the partition-confined 3-arm MERGE (plus
  how many files it carried by reference vs rewrote);
- delete_from_table: deletion-vector DELETE of every 13th key (plus
  data files rewritten — must be 0 at any scale);
- serve_bm25: BM25 serve from the persisted inverted index (postings
  pruned to 3 term buckets — expected ~flat);
- scan(): the composed partition+zone+DV read of one year's key band.

Usage: python tools/table_growth_probe.py [sf_dir ...]
Prints one JSON line per (op, sf).  Run idle (after sweeps).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from morphl_model_user_search_intent_spark.io import table
    from morphl_model_user_search_intent_spark.sources import acid
    from morphl_model_user_search_intent_spark.text import searchindex as si

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sfs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".scratch/scale10x"),
    ]
    for sf in sfs:
        tag = os.path.basename(sf.rstrip("/"))
        base = table(spark, sf, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("price"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        root = f"/tmp/growth-{tag}"
        shutil.rmtree(root, ignore_errors=True)
        acid.create_table_partitioned(
            spark,
            root,
            base.repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey"),
            partition_cols=["o_year"],
            stats_cols=["o_orderkey"],
        )
        m1 = acid.read_manifest(root)

        t0 = time.perf_counter()
        acid.merge_table_partitioned(
            spark, root, acid._part_merge_source(spark, sf), "o_orderkey"
        )
        w_merge = time.perf_counter() - t0
        m2 = acid.read_manifest(root)
        carried = len(set(m1["files"]) & set(m2["files"]))
        print(json.dumps({
            "op": "merge_partitioned", "sf": tag,
            "wall_s": round(w_merge, 2),
            "files_carried": carried,
            "files_rewritten": len(m1["files"]) - carried,
        }))

        t0 = time.perf_counter()
        acid.delete_from_table(
            spark, root,
            base.filter(F.col("o_orderkey") % 13 == 0).select("o_orderkey"),
            "o_orderkey",
        )
        w_del = time.perf_counter() - t0
        m3 = acid.read_manifest(root)
        print(json.dumps({
            "op": "delete_dv", "sf": tag,
            "wall_s": round(w_del, 2),
            "data_files_rewritten": len(set(m3["files"]) ^ set(m2["files"])),
        }))

        mk = base.agg(F.max("o_orderkey")).collect()[0][0]
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            acid.scan(
                spark, root,
                partition_filter={"o_year": 1995},
                ranges={"o_orderkey": (0.2 * mk, 0.4 * mk)},
            ).groupBy().count().collect()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "op": "scan_composed", "sf": tag, "wall_s": round(best, 3),
        }))

        ti_root = si.build_text_index(spark, sf)
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            si.serve_bm25(spark, ti_root).collect()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "op": "serve_bm25", "sf": tag, "wall_s": round(best, 3),
        }))
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
