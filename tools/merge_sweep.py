"""Merge sharded driver_sim outputs into one CORRECTNESS artifact.

Usage: python tools/merge_sweep.py OUT.txt "header text" part1.txt ...
Keeps ONE line per query key (the LAST occurrence wins, so re-runs
override earlier crashed-JVM failures), sorted by key, with a summary
line (n match / n rows-only / n FAIL) at the top.
"""

from __future__ import annotations

import re
import sys

OUT, HEADER, PARTS = sys.argv[1], sys.argv[2], sys.argv[3:]

LINE = re.compile(
    r"(q_[a-z0-9_]+) +([0-9.]+)s +(match \([0-9]+ rows\)"
    r"(?:  \[eng [^\]]*\])?"
    r"|rows-only \([0-9]+ rows\)(?:  \[eng [^\]]*\])?"
    r"|FAIL.*)"
)

rows: dict[str, tuple[str, str]] = {}
for p in PARTS:
    with open(p) as fh:
        for raw in fh:
            m = LINE.search(raw)
            if m:
                rows[m.group(1)] = (m.group(2), m.group(3).strip())

n_match = sum(1 for _, s in rows.values() if s.startswith("match"))
n_rows = sum(1 for _, s in rows.values() if s.startswith("rows-only"))
n_fail = len(rows) - n_match - n_rows
with open(OUT, "w") as f:
    f.write(HEADER.rstrip() + "\n")
    f.write(
        f"{len(rows)} queries: {n_match} match, {n_rows} rows-only, "
        f"{n_fail} FAIL\n\n"
    )
    for k in sorted(rows):
        sec, status = rows[k]
        f.write(f"  {k:32s} {float(sec):8.2f}s  {status}\n")
print(f"{OUT}: {len(rows)} keys, {n_fail} FAIL")
