"""SparkSession factory with the configuration every operator relies on.

SURVEY.md §7.0: the nanos-timestamp workaround and UTC session timezone
are load-bearing — without ``spark.sql.legacy.parquet.nanosAsLong`` any
read of ``events.parquet`` (Parquet TIMESTAMP(NANOS)) fails with
``PARQUET_TYPE_ILLEGAL`` on Spark 4.x.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and required) to apply to an externally provided
# session at runtime — all are dynamic SQL confs.
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ~cores beats the 200 default at test scale; at cluster scale AQE
    # coalescing makes this a ceiling hint, not a straitjacket.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_SHUFFLE_PARTITIONS",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    ),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # NOTE: no global coalescePartitions.minPartitionSize override.
    # Round 2 set a 16k floor here to keep small local-mode shuffles
    # parallel; it helped q_sessionize (1.4 -> 1.1 s) but per-task
    # scheduling overhead on every OTHER small shuffle regressed
    # q_win_topk 0.63 -> 2.07 s and q_agg_distinct 0.64 -> 1.63 s
    # (BENCH_r02 vs r01).  The parallelism-sensitive plans now pin
    # their own partitioning with an explicit repartition(N, key) —
    # which AQE never coalesces — instead of a global conf that taxes
    # every query.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# Sessions already configured this process: id -> weakref.  Each
# conf.set is a py4j RPC (~1-5 ms); operators call configure() via
# io.table() on every query build, so skipping the ~7 RPCs for a
# session we've already configured shaves real milliseconds off every
# plan construction.  The weakref check makes id-reuse after GC safe.
_CONFIGURED: dict[int, object] = {}


def configure(spark: SparkSession) -> SparkSession:
    """Apply required dynamic confs to an existing session (e.g. the
    driver's). Idempotent; ignores confs the session refuses."""
    import weakref

    ref = _CONFIGURED.get(id(spark))
    if ref is not None and ref() is spark:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf on this build — best effort
            pass
    _CONFIGURED[id(spark)] = weakref.ref(spark)
    return spark


def get_spark(
    app_name: str = "morphl-spark-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local-mode sizing follows the driver env: ``SPARK_GRAFT_CPUS``
    threads, shuffle partitions ≈ cores (never the 200 default — wrong
    at both test scale and, via AQE coalescing, harmless to override on
    a real cluster).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(cpus))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
