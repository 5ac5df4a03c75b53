"""Physical-plan audit over the registered queries: for each queries()
entry, print the plan-shape facts that matter at 100 TB — broadcast vs
sort-merge joins, Exchange (shuffle) count, pushed filters on parquet
scans, and Python-eval operators (which must be zero outside the
multimodal mapInPandas path).

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
       python scripts/plan_audit.py --summary   # totals only

This is the tooling behind PERF.md's per-round plan audits: run it after
touching any registered query and diff the counts. A new SortMergeJoin
where a dim should broadcast, an extra Exchange, or a BatchEvalPython
outside multimodal is a regression even when correctness stays green.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Queries whose plans legitimately contain Python evaluation (Arrow
#: mapInPandas codec paths) or that run streaming/multi-action bodies a
#: single explain cannot represent.
PYTHON_OK = {"multimodal_decode"}
SKIP = {
    # streaming queries materialize via query.start(); plan introspection
    # happens in their own pytest suites instead.
    "stream_suite",
}


def audit(name: str, df) -> dict[str, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return {
        # Counts come from the pre-execution AdaptiveSparkPlan (AQE may
        # still convert SMJ->BHJ at runtime, never the reverse, so the
        # static counts are the conservative bound). Codegen spans are
        # not visible pre-execution under AQE and are deliberately not
        # reported.
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "python_evals": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        "pushed_filter_scans": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        # Partitioned-layout evidence (r9): scans carrying a non-empty
        # PartitionFilters list (directory-level pruning at plan time)
        # and dynamicpruningexpression occurrences (runtime DPP through
        # a join).
        "partition_filter_scans": len(
            re.findall(r"PartitionFilters: \[[^\]]", plan)
        ),
        "dynamic_pruning": len(re.findall(r"dynamicpruning", plan)),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--summary"]
    summary_only = "--summary" in sys.argv
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import __spark_entry__ as entry
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    targets = names or [n for n in queries if n not in SKIP]
    totals = {"python_violations": 0, "sortmerge_joins": 0, "exchanges": 0}
    for name in targets:
        if name in SKIP:
            print(f"SKIP  {name}: streaming body, audited in pytest")
            continue
        try:
            stats = audit(name, queries[name](spark, sf_dir))
        except Exception as exc:  # plan-time failure is a real finding
            print(f"ERR   {name}: {type(exc).__name__}: {exc}")
            continue
        violation = stats["python_evals"] > 0 and name not in PYTHON_OK
        totals["python_violations"] += int(violation)
        totals["sortmerge_joins"] += stats["sortmerge_joins"]
        totals["exchanges"] += stats["exchanges"]
        if not summary_only:
            flag = "  PYTHON-IN-PLAN" if violation else ""
            print(
                f"{name}: bhj={stats['broadcast_joins']} "
                f"smj={stats['sortmerge_joins']} ex={stats['exchanges']} "
                f"pushed={stats['pushed_filter_scans']} "
                f"pf={stats['partition_filter_scans']} "
                f"dpp={stats['dynamic_pruning']} "
                f"py={stats['python_evals']}{flag}"
            )
    print(
        f"TOTAL queries={len(targets)} exchanges={totals['exchanges']} "
        f"sortmerge={totals['sortmerge_joins']} "
        f"python_violations={totals['python_violations']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
