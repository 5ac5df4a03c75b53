"""Power-user skew measurement for the windowed funnel (r12, VERDICT
r11 #4).

``funnel_steps``' gap-windowed plan runs a per-user window per ladder
pass — AQE's skew handling splits joins, not windows, so one user
owning a large share of events is a genuine straggler surface. This
script measures it: it stages a copy of a scale corpus with ~10% of
ALL events reassigned to one synthetic power user, runs the windowed
funnel, and reports per-stage task-skew numbers straight from the
Spark UI REST API (max vs median task duration per stage, and the hot
stage's share of job wall-clock).

The documented bound (operators/analytics.py: funnel_steps): each
ladder pass's window input is the user's events of the TWO types
involved in that pass, so the hot task carries ~f*N*2/T rows, not
f*N. The check FAILS loudly only on a pathological straggler (one
task's duration exceeding STRAGGLER_FRACTION of total job time) or a
wrong funnel result (monotone step counts violated) — the skew ratios
themselves are recorded for PERF.md.

Usage: python scripts/funnel_skew_check.py [scale_dir]
       (default /tmp/scale/sf3.0; the skewed copy is staged next to it
        as <scale_dir>_skew/events.parquet and reused when present)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POWER_USER = -777
STRAGGLER_FRACTION = 0.5  # one task >50% of job wall-clock = pathological
STEPS = ["view", "click", "signup", "purchase"]
GAP_SECONDS = 48 * 3600


def main() -> int:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf3.0"
    src = os.path.join(scale_dir, "events.parquet")
    skew_dir = scale_dir.rstrip("/") + "_skew"
    dst = os.path.join(skew_dir, "events.parquet")

    from pyspark.sql import functions as F

    from datawarehouse_group10_spark.operators.analytics import funnel_steps
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(dst):
        os.makedirs(skew_dir, exist_ok=True)
        ev = spark.read.parquet(src)
        # every 10th event re-homes to the power user: ~10% of ALL
        # events (every type) on one key, the verdict's scenario
        skewed = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 == 0, F.lit(POWER_USER)).otherwise(
                F.col("user_id")
            ),
        )
        tmp = dst + ".staging"
        skewed.coalesce(8).write.mode("overwrite").parquet(tmp)
        os.rename(tmp, dst)

    ev = spark.read.parquet(dst)
    n = ev.count()
    hot = ev.filter(F.col("user_id") == POWER_USER).count()
    t0 = time.time()
    rows = funnel_steps(
        ev, STEPS, within_seconds=GAP_SECONDS
    ).orderBy("step").collect()
    wall = time.time() - t0

    problems: list[str] = []
    counts = [r["n_users"] for r in rows]
    if counts != sorted(counts, reverse=True):
        problems.append(f"step counts not monotone: {counts}")
    if counts[0] <= 0:
        problems.append("empty funnel")

    # Per-stage task skew from the Spark UI REST API (local mode).
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as fh:
        stages = json.loads(fh.read())
    report = []
    worst = (0.0, 0.0, None)  # (task_sec, ratio, stage)
    for st in stages:
        if st["numCompleteTasks"] < 2:
            continue
        sid = st["stageId"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{sid}/"
            f"{st['attemptId']}/taskSummary?quantiles=0.5,1.0"
        ) as fh:
            q = json.loads(fh.read())
        med, mx = (v / 1000.0 for v in q["executorRunTime"])
        if mx < 0.2:
            continue  # sub-200ms stages are scheduling noise
        ratio = mx / max(med, 1e-3)
        report.append(
            (mx, f"stage {sid} ({st['numCompleteTasks']} tasks): "
                 f"max={mx:.2f}s median={med:.2f}s ratio={ratio:.1f}x")
        )
        if mx > worst[0]:
            worst = (mx, ratio, sid)
    if worst[0] > STRAGGLER_FRACTION * wall:
        problems.append(
            f"straggler: stage {worst[2]} hot task {worst[0]:.2f}s > "
            f"{STRAGGLER_FRACTION:.0%} of job wall {wall:.2f}s"
        )

    status = "FAIL" if problems else "OK"
    print(
        f"{status}  windowed funnel @ {skew_dir}: {n} events, power user "
        f"owns {hot} ({hot / n:.1%}), job wall {wall:.1f}s, funnel "
        f"counts {counts}; hot task {worst[0]:.2f}s "
        f"({worst[0] / max(wall, 1e-9):.0%} of wall, {worst[1]:.1f}x its "
        f"stage median)"
    )
    for _mx, line in sorted(report, reverse=True)[:8]:
        print(f"  {line}")
    for p in problems:
        print(f"  - {p}")
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
