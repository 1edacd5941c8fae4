"""A/B the Catalyst runtime bloom-filter join (q_join_bloom shape) at
amplified scale: same selective-dimension shuffle join with
InjectRuntimeFilter ON vs OFF, reporting warm wall time and shuffle
write bytes (UI REST stage metrics — the cluster-scale network cost).

The bloom arm should shuffle only the fact rows that can survive the
join (~ the dimension predicate's selectivity), the control arm the
whole fact side; the bytes ratio is the direct evidence for the
"prune before the shuffle" claim in q_join_bloom's docstring.

Usage: python tools/bloom_ab.py [scale_dir]   (default .scratch/scale100x)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from morphl_model_user_search_intent_spark.functions.exact import lsum, units
from morphl_model_user_search_intent_spark.io import table


def _stages(spark) -> dict[int, dict]:
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        data = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{app}/stages?status=complete"
            )
        )
    except Exception:
        return {}
    return {s["stageId"]: s for s in data}


def _join(spark: SparkSession, sf_dir: str):
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return l.join(o, l.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n_rows"),
        lsum(units("l_extendedprice", 100), 100, "revenue"),
    )


def _run(spark, sf_dir, bloom: bool) -> tuple[float, int, list]:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", str(bloom).lower()
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1KB",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "512MB",
    )
    # size the filter for the creation side (default expects 1M items
    # in 8.4M bits; 100x urgent orders is ~1.5M keys → high false-pass)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        "4000000",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.numBits", "67108864"
    )
    rows = _join(spark, sf_dir).collect()  # warm: listing + JIT
    before = set(_stages(spark))
    # fresh plan for the timed run: re-collecting the SAME DataFrame
    # would reuse its shuffle output (stages skipped, 0 bytes written)
    df = _join(spark, sf_dir)
    t0 = time.perf_counter()
    df.collect()
    dt = time.perf_counter() - t0
    time.sleep(0.4)
    new = [s for sid, s in _stages(spark).items() if sid not in before]
    shw = sum(s.get("shuffleWriteBytes", 0) for s in new)
    return dt, shw, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "scale100x"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bloom-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    t_off, b_off, r_off = _run(spark, sf_dir, bloom=False)
    t_on, b_on, r_on = _run(spark, sf_dir, bloom=True)
    assert [tuple(r) for r in r_on] == [tuple(r) for r in r_off], (
        "bloom arm changed the answer"
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "bloom_off": {"sec": round(t_off, 3), "shuffle_mb": round(b_off / 1e6, 2)},
                "bloom_on": {"sec": round(t_on, 3), "shuffle_mb": round(b_on / 1e6, 2)},
                "shuffle_reduction": round(b_off / max(b_on, 1), 2),
                "result": [tuple(r) for r in r_on][0],
            },
            default=str,
        )
    )


if __name__ == "__main__":
    main()
