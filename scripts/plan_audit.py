"""Physical-plan audit over the registered queries: for each queries()
entry, print the plan-shape facts that matter at 100 TB — broadcast vs
sort-merge joins, Exchange (shuffle) count, pushed filters on parquet
scans, and Python-eval operators (which must be zero outside the
multimodal mapInPandas path).

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
       python scripts/plan_audit.py --summary   # totals only

Streaming coverage (r12, VERDICT r11 #3): stream_suite is no longer
SKIPped — running its body with streaming.PLAN_CAPTURE armed records
each foreachBatch body's microbatch plan (the merged mart, the mined
pair set, the CDC MERGE rewrite) plus the pre-start plans of pure
streaming sinks, and those plans are audited with the same counters as
sub-lines ``stream_suite/<tag>``. The suite still counts as ONE query
in the total; its microbatch shuffles/python-evals roll into the
totals.

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
#: mapInPandas codec paths).
PYTHON_OK = {"multimodal_decode"}
#: Queries whose CALL executes streaming pipelines (plan capture armed).
STREAMING = {"stream_suite"}


def audit_plan(plan: str) -> dict[str, int]:
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


def audit(df) -> dict[str, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return audit_plan(buf.getvalue())


def _fmt(stats: dict[str, int], flag: str = "") -> str:
    return (
        f"bhj={stats['broadcast_joins']} "
        f"smj={stats['sortmerge_joins']} ex={stats['exchanges']} "
        f"pushed={stats['pushed_filter_scans']} "
        f"pf={stats['partition_filter_scans']} "
        f"dpp={stats['dynamic_pruning']} "
        f"py={stats['python_evals']}{flag}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--summary"]
    summary_only = "--summary" in sys.argv
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import __spark_entry__ as entry
    from datawarehouse_group10_spark import streaming
    from datawarehouse_group10_spark.sources import layout
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    targets = names or list(queries)
    totals = {"python_violations": 0, "sortmerge_joins": 0, "exchanges": 0}

    def account(name: str, stats: dict[str, int]) -> None:
        violation = stats["python_evals"] > 0 and name.split("/")[0] not in PYTHON_OK
        totals["python_violations"] += int(violation)
        totals["sortmerge_joins"] += stats["sortmerge_joins"]
        totals["exchanges"] += stats["exchanges"]
        if not summary_only:
            flag = "  PYTHON-IN-PLAN" if violation else ""
            print(f"{name}: {_fmt(stats, flag)}")

    for name in targets:
        capture: dict[str, str] | None = None
        if name in STREAMING:
            capture = {}
            streaming.PLAN_CAPTURE = capture
            layout.MERGE_PLAN_HOOK = streaming.capture_plan
        try:
            df = queries[name](spark, sf_dir)
            stats = audit(df)
        except Exception as exc:  # plan-time failure is a real finding
            print(f"ERR   {name}: {type(exc).__name__}: {exc}")
            continue
        finally:
            if capture is not None:
                streaming.PLAN_CAPTURE = None
                layout.MERGE_PLAN_HOOK = None
        account(name, stats)
        for tag in sorted(capture or {}):
            account(f"{name}/{tag}", audit_plan(capture[tag]))
    print(
        f"TOTAL queries={len(targets)} exchanges={totals['exchanges']} "
        f"sortmerge={totals['sortmerge_joins']} "
        f"python_violations={totals['python_violations']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
