"""Spill probe: do the shuffle-heavy plans DEGRADE (spill) rather
than DIE (OOM) when the per-task memory budget shrinks?

At 100 TB an executor never holds its whole partition share in
memory; the scale contract is that sorts/aggregations/joins spill to
disk and finish.  local[] mode puts driver and executors in one JVM,
so shrinking ``spark.driver.memory`` IS the executor-memory squeeze.
This tool runs the shuffle-heaviest queries over the
100x amplified dataset (~1.5 GB on disk, events fact ~60M rows) under
a deliberately small heap, and reports per-query wall time plus
memory/disk spill bytes from the UI REST stage metrics.

A healthy result is nonzero spill WITH correct completion — proof the
plans run in bounded memory.  An OOM or a zero-spill pass (heap not
actually constrained) both fail the probe's purpose and are reported
as such.

Usage: python tools/spill_probe.py [heap] [scale_dir]
       (defaults: 1g .scratch/scale100x — run tools/scale_stress.py
       first to materialize the amplified dataset)
Writes SPILL.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAP = sys.argv[1] if len(sys.argv) > 1 else "1g"
SCALE_DIR = sys.argv[2] if len(sys.argv) > 2 else ".scratch/scale100x"

# The headline queries that move the most shuffle bytes at 100x
# (SCALING.md): a fact-fact SMJ, a per-user window pass, and the
# windowed top-k — the operator classes whose state grows with data.
# Round 5 adds its two shuffle-bearing newcomers: the chunked
# sessionizer (two window grains + a merge window; largest shuffle
# in SCALING.md's new rows) and the serve-from-index path (sorts the
# per-query candidate set under the same squeezed heap).
QUERIES = [
    "q_join_unshipped",
    "q_sessionize",
    "q_win_topk",
    "q_win_fill_forward",
    "q_sessionize_chunked",
    "q_sim_index_serve",
]


def _stages(spark) -> dict[int, dict] | None:
    """Completed stages from the UI REST API, or None when the fetch
    itself fails.  None vs {} matters (round-2 advisor): silently
    treating a failed fetch as "no stages" would either zero the spill
    numbers (reporting 'no spill' when the probe actually measured
    nothing) or, for a failed 'before' snapshot, misattribute prior
    queries' stages to the current one."""
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        data = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{app}/stages?status=complete"
            )
        )
    except Exception:
        return None
    return {s["stageId"]: s for s in data}


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from morphl_model_user_search_intent_spark import REGISTRY
    from morphl_model_user_search_intent_spark.session import (
        RUNTIME_CONFS,
        configure,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.appName("spill-probe")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", HEAP)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = configure(b.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in QUERIES:
        fn = REGISTRY[name].fresh
        before_stages = _stages(spark)
        t0 = time.perf_counter()
        try:
            # Checksum-aggregate, NOT collect() and NOT count():
            # collect() would materialize a 100x result set onto the
            # deliberately squeezed driver heap (round-2 advisor) —
            # and count() lets Catalyst PRUNE the expensive operator
            # when no downstream consumer needs its columns (observed:
            # q_win_fill_forward's WindowExec eliminated entirely,
            # 0.38 s / 0 spill — a vacuous probe).  Hashing every
            # column into one bit_xor(xxhash64(...)) forces full
            # evaluation and returns a single row (xor is closed over
            # int64 — no ANSI overflow, unlike sum).
            df = fn(spark, SCALE_DIR)
            n = df.agg(
                F.count(F.lit(1)),
                F.bit_xor(F.xxhash64(F.struct(*df.columns))),
            ).collect()[0][0]
            err = None
        except Exception as ex:  # noqa: BLE001
            n, err = -1, f"{type(ex).__name__}"
        dt = time.perf_counter() - t0
        time.sleep(0.3)
        after_stages = _stages(spark)
        if before_stages is None or after_stages is None:
            # Fetch failure ≠ "no spill": mark metrics unavailable
            # rather than reporting a clean zero.
            mem_mb = disk_mb = None
        else:
            new = [
                s
                for sid, s in after_stages.items()
                if sid not in before_stages
            ]
            mem_mb = round(
                sum(s.get("memoryBytesSpilled", 0) for s in new) / 2**20, 1
            )
            disk_mb = round(
                sum(s.get("diskBytesSpilled", 0) for s in new) / 2**20, 1
            )
        rows.append(
            {
                "query": name,
                "sec": round(dt, 3),
                "rows": n,
                "mem_spill_mb": mem_mb,
                "disk_spill_mb": disk_mb,
                "error": err,
            }
        )

    mb = lambda r: (  # noqa: E731
        "metrics unavailable"
        if r["mem_spill_mb"] is None
        else f"{r['mem_spill_mb']:,.1f} / {r['disk_spill_mb']:,.1f}"
    )
    lines = [
        "# SPILL — bounded-memory completion under a squeezed heap",
        "",
        f"Generated by `python tools/spill_probe.py {HEAP} {SCALE_DIR}`: "
        "the shuffle-heaviest queries over the 100x "
        f"amplified dataset with the whole local[{cpus}] JVM capped at "
        f"**{HEAP}** (driver = executors in local mode, so this is the "
        "per-executor squeeze).  The scale contract is graceful "
        "degradation: when sort/aggregate/join state exceeds the task "
        "memory budget, Spark's UnsafeExternalSorter spills runs to "
        "disk and merges — slower, never dead.  Nonzero spill + "
        "correct row counts = the plans hold in bounded memory; an "
        "OOM would mean an operator assumes resident state (the thing "
        "that kills jobs at 100 TB, where per-task data share always "
        "exceeds RAM).",
        "",
        "| Query | sec | result rows | mem / disk spill MB | status |",
        "| --- | --- | --- | --- | --- |",
    ]
    for r in rows:
        if r["error"]:
            status = r["error"]
        elif r["mem_spill_mb"] is None:
            status = "completed (spill metrics unavailable)"
        elif r["disk_spill_mb"] > 0 or r["mem_spill_mb"] > 0:
            status = "completed, spilled"
        else:
            status = "completed (no spill at this heap)"
        lines.append(
            f"| {r['query']} | {r['sec']} | {r['rows']:,} | {mb(r)} "
            f"| {status} |"
        )
    lines += [
        "",
        "Knob guidance at real scale: size "
        "`spark.sql.shuffle.partitions` so post-shuffle partitions "
        "sit well under the executor task budget (AQE coalescing "
        "handles the small side automatically), keep "
        "`spark.sql.files.maxPartitionBytes` at/below 128 MB so scan "
        "tasks bound their input, and treat sustained spill as the "
        "signal to add partitions — not memory.",
        "",
    ]
    with open(os.path.join(REPO, "SPILL.md"), "w") as f:
        f.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "spill_probe",
                "heap": HEAP,
                "queries": {r["query"]: r for r in rows},
            }
        )
    )


if __name__ == "__main__":
    main()
