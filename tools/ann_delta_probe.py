"""Serve latency vs delta size: why ANN delta compaction exists.

The index+delta serving design (llm/index.py) keeps appends queryable
before any rebuild by brute-force-scanning the unindexed delta beside
the routed index.  That is the right trade at small delta — and
degrades toward brute force as the delta grows, which is exactly what
q_sim_index_compact's fold-and-swap resets.  This probe MEASURES that
curve on the PRUNED production probe (nprobe=4 of 16 — the routed
serve whose whole point is reading a fraction of the corpus): a fixed
indexed corpus with delta sets of 0/10/25/50/100% of corpus size
(appended copies with shifted vec_ids), then the post-compaction
point — the SAME 100%-grown corpus after the delta is folded into the
snapshot — showing serve returning to routed-scan cost at equal data
size.  The delta is scanned brute-force by EVERY query regardless of
nprobe, which is exactly the degradation compaction resets; the
exhaustive probe would hide it behind a full-corpus scan.

Timing: noop-sink drain, fresh plan per run, best-of-3 (this host
shows ~3x disk dips; see SCALING.md's methodology note).  Run on an
idle host: python tools/ann_delta_probe.py [sf_dir]
Appends/updates the "## Serve latency vs delta size" section of
SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from morphl_model_user_search_intent_spark import get_spark  # noqa: E402
from morphl_model_user_search_intent_spark.io import table  # noqa: E402
from morphl_model_user_search_intent_spark.llm.index import (  # noqa: E402
    _K_LISTS,
    append_to_store,
    build_index,
    compact_index,
    serve_from_store,
    serve_topk,
)
from morphl_model_user_search_intent_spark.sources.formats import (  # noqa: E402
    SCRATCH,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FRACTIONS = (0.0, 0.1, 0.25, 0.5, 1.0)
NPROBE = 4  # pruned production probe; _K_LISTS = 16


def _drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best3(build) -> float:
    _drain(build())  # warm: listing + plan + JIT
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _drain(build())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="ann-delta-probe")
    e = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_corpus = e.count()
    idx = build_index(spark, SF_DIR)

    rows = []
    tag = os.path.basename(SF_DIR.rstrip("/")).replace(".", "_")
    delta_root = os.path.join(SCRATCH, f"delta-probe-{tag}")
    for frac in FRACTIONS:
        if frac == 0.0:
            rows.append(
                ("0%", 0, _best3(
                    lambda: serve_topk(spark, idx, NPROBE, 5)
                ))
            )
            continue
        d = os.path.join(delta_root, f"f{int(frac * 100)}")
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            shutil.rmtree(d, ignore_errors=True)
            (
                e.filter(F.col("vec_id") % 100 < int(frac * 100))
                .withColumn(
                    "vec_id", F.col("vec_id") + F.lit(10_000_000)
                )
                .write.mode("overwrite")
                .parquet(d)
            )
        delta = spark.read.parquet(d)
        n_delta = delta.count()
        rows.append(
            (
                f"{int(frac * 100)}%",
                n_delta,
                _best3(
                    lambda: serve_topk(
                        spark, idx, NPROBE, 5,
                        delta=spark.read.parquet(d),
                    )
                ),
            )
        )

    # post-compaction point: the SAME fully-grown corpus (index half +
    # 100% delta) folded into one snapshot — serve cost returns to the
    # pure-index shape at equal data size.
    store = os.path.join(SCRATCH, f"delta-probe-store-{tag}")
    shutil.rmtree(store, ignore_errors=True)
    os.makedirs(os.path.join(store, "snapshots"), exist_ok=True)
    from morphl_model_user_search_intent_spark.llm import index as ix

    # stage the full index as snap-000001, append a 100% delta copy
    ix._stage_index(
        spark,
        os.path.join(store, "snapshots", "snap-000001"),
        spark.read.parquet(os.path.join(idx, "lists")),
        ix.load_centroid_rows(idx),
        ix.load_books(idx),
        "probe",
    )
    ix._swap_current(store, "snap-000001")
    append_to_store(
        e.withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000)),
        store,
    )
    pre = _best3(
        lambda: serve_from_store(spark, store, NPROBE, 5)
    )
    compact_index(spark, store)
    post = _best3(
        lambda: serve_from_store(spark, store, NPROBE, 5)
    )

    lines = [
        "## Serve latency vs delta size",
        "",
        f"Generated by `python tools/ann_delta_probe.py {SF_DIR}` "
        f"(indexed corpus {n_corpus:,} vectors; delta = appended "
        "copies with shifted ids; PRUNED production probe nprobe="
        f"{NPROBE}/16; noop drain, fresh plans, best-of-3).  The delta is "
        "scanned brute-force by EVERY query — the curve below is the "
        "degradation q_sim_index_compact's fold-and-swap resets: the "
        "last two rows hold data size CONSTANT (corpus + 100% delta) "
        "and move the delta into the snapshot.",
        "",
        "| Serving state | delta vectors | serve sec (best of 3) |",
        "| --- | --- | --- |",
    ]
    for label, n_delta, sec in rows:
        lines.append(f"| index + {label} delta | {n_delta:,} | {sec:.3f} |")
    lines.append(
        f"| 2× corpus, pre-compaction (index + 100% delta) | "
        f"{n_corpus:,} | {pre:.3f} |"
    )
    lines.append(
        f"| 2× corpus, POST-compaction (folded snapshot, no delta) | "
        f"0 | {post:.3f} |"
    )
    lines.append("")

    out = os.path.join(REPO, "SCALING.md")
    txt = open(out).read() if os.path.exists(out) else ""
    marker = "## Serve latency vs delta size"
    if marker in txt:
        txt = txt[: txt.index(marker)].rstrip() + "\n\n"
    txt += "\n".join(lines)
    with open(out, "w") as f:
        f.write(txt)
    print(
        json.dumps(
            {
                "metric": "ann_delta_probe",
                "rows": [
                    {"state": s, "delta": n, "sec": round(t, 3)}
                    for s, n, t in rows
                ],
                "pre_compaction_sec": round(pre, 3),
                "post_compaction_sec": round(post, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
