"""Compare a query's CURRENT formatted plan against a committed
plans/r10/<name>_<tag>.txt dump, canonicalizing expression ids,
plan ids and file-listing noise.  Exit 0 = identical shape.

Usage: python tools/plan_diff.py <name> [--against before] [--save after]
"""

from __future__ import annotations

import argparse
import difflib
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from morphl_model_user_search_intent_spark import REGISTRY, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(REPO, "plans", "r10")


def canon(s: str) -> str:
    s = re.sub(r"#\d+", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=N", s)
    s = re.sub(r"Location: InMemoryFileIndex \[[^\]]*\]", "Location: X", s)
    s = re.sub(r"\(\d+\)", "(n)", s)  # operator numbering shifts
    return s


def formatted(name: str) -> str:
    spark = get_spark(app_name="plan_diff")
    df = REGISTRY[name].fresh(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--against", default="before")
    ap.add_argument("--save", default="")
    args = ap.parse_args()
    cur = formatted(args.name)
    if args.save:
        os.makedirs(PLAN_DIR, exist_ok=True)
        with open(
            os.path.join(PLAN_DIR, f"{args.name}_{args.save}.txt"), "w"
        ) as fh:
            fh.write(cur)
    ref_path = os.path.join(PLAN_DIR, f"{args.name}_{args.against}.txt")
    if not os.path.exists(ref_path):
        print(f"no reference plan {ref_path}; saved only")
        return
    ref = open(ref_path).read()
    a, b = canon(ref), canon(cur)
    if a == b:
        print(f"{args.name}: PLAN IDENTICAL to {args.against}")
        return
    print(f"{args.name}: plan DIFFERS from {args.against}:")
    for line in difflib.unified_diff(
        a.splitlines(), b.splitlines(), lineterm=""
    ):
        print(line)
    sys.exit(1)


if __name__ == "__main__":
    main()
