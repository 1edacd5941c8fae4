"""Round-9 probe (r8 verdict item 8): inverted-index lifecycle growth
evidence at sf0.1 vs the 10x-amplified scale10x fixture (~sf1.0).

Measures, per scale factor, on a PRIVATE index root (never the shared
staged exercise index — round-8 gotcha):

- build: full-corpus postings+docstats build wall, postings bytes,
  postings file count;
- append x4: the 10% delta folded in as four slices (the streaming
  micro-batch shape — each fold adds one small file per touched
  bucket); wall per fold — must track DELTA size, not corpus size;
- serve: BM25 top-k best-of-3, before appends, after the 4-fold file
  tail, and after compaction — post-compaction latency must return to
  ~the pre-tail number;
- compact: stage-then-swap rewrite wall, file count after.

Usage: python tools/searchindex_growth_probe.py [sf_dir ...]
Prints one JSON line per (op, sf).  Run idle.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _postings_stats(root: str) -> tuple[int, int]:
    n, b = 0, 0
    for r, _, fs in os.walk(os.path.join(root, "postings")):
        for f in fs:
            if f.endswith(".parquet"):
                n += 1
                b += os.path.getsize(os.path.join(r, f))
    return n, b


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from morphl_model_user_search_intent_spark.io import table
    from morphl_model_user_search_intent_spark.text import (
        searchindex as si,
    )

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
        root = f"/tmp/sigrowth-{tag}"
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        d = table(spark, sf, "documents").select("doc_id", "text")
        base = d.filter(F.col("doc_id") % 10 != 0)
        n_docs = d.count()

        t0 = time.perf_counter()
        postings, docstats = si._postings_and_stats(base)
        postings.write.partitionBy("bucket").parquet(
            os.path.join(root, "postings")
        )
        docstats.write.parquet(os.path.join(root, "docstats"))
        w_build = time.perf_counter() - t0
        nf, nb = _postings_stats(root)
        print(json.dumps({
            "op": "build", "sf": tag, "docs": n_docs,
            "wall_s": round(w_build, 2),
            "postings_files": nf, "postings_mb": round(nb / 2**20, 1),
        }))

        def serve_best3() -> float:
            best = 9e9
            for _ in range(3):
                t0 = time.perf_counter()
                si.serve_bm25(spark, root).collect()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        print(json.dumps({
            "op": "serve_pre_tail", "sf": tag, "wall_s": serve_best3(),
        }))

        for i in range(4):
            delta = d.filter(
                (F.col("doc_id") % 10 == 0)
                & (F.col("doc_id") % 40 == i * 10)
            )
            nd = delta.count()
            t0 = time.perf_counter()
            si.append_text_index(spark, root, delta)
            print(json.dumps({
                "op": "append", "sf": tag, "slice": i,
                "delta_docs": nd,
                "wall_s": round(time.perf_counter() - t0, 2),
            }))
        nf, nb = _postings_stats(root)
        print(json.dumps({
            "op": "post_tail", "sf": tag,
            "postings_files": nf, "postings_mb": round(nb / 2**20, 1),
            "serve_wall_s": serve_best3(),
        }))

        t0 = time.perf_counter()
        si.compact_text_index(spark, root)
        w_comp = time.perf_counter() - t0
        nf, nb = _postings_stats(root)
        print(json.dumps({
            "op": "compact", "sf": tag, "wall_s": round(w_comp, 2),
            "postings_files": nf, "postings_mb": round(nb / 2**20, 1),
            "serve_wall_s": serve_best3(),
        }))
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
