"""SparkSession factory tuned for both local testing and cluster scale.

The defaults here are the scale-hygiene settings SURVEY.md section 7.7 calls
for: AQE on (runtime partition coalescing, skew-join splitting, dynamic
broadcast), Arrow for any pandas interchange, and a shuffle-partition count
that the caller overrides per deployment (32 for local[32] tests; thousands
on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "datawarehouse_group10_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    On a real cluster ``master`` comes from spark-submit and this function
    only contributes the SQL confs; locally it defaults to ``local[N]``.
    """
    builder = SparkSession.builder.appName(app_name)
    local = False
    if master:
        builder = builder.master(master)
        local = master.startswith("local")
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
        local = True
    if local:
        # Spark's local-mode default driver memory is 1g, and in local mode
        # EVERY task thread shares that one heap — local[32] at 1g OOMs the
        # JVM long before any plan is at fault (observed: a 45-query sf1.0
        # session died mid-fixpoint). Size it like the executors it stands
        # in for. Only effective at JVM launch, hence set here, not later.
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )

    conf = {
        # Adaptive execution: runtime coalescing, skew-join handling, and
        # dynamic broadcast conversion. Essential at 100 TB, free locally.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Arrow for every pandas_udf / toPandas round-trip.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Dimensions in this model are tiny; let them broadcast aggressively.
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        # Runtime bloom-filter pushdown: when one join side is selective,
        # inject a bloom filter of its keys into the other side's SCAN so
        # non-matching rows drop before the shuffle. At 100 TB this is a
        # major fact-table scan reduction for selective dim joins (the
        # Q3/Q5 shape); explicit here because cluster images vary in
        # their default.
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # Timestamps in testdata are ntz-like; keep session in UTC so
        # date arithmetic is deterministic across engines.
        "spark.sql.session.timeZone": "UTC",
        # File-listing strategy (r18, guide §6 file listing / §7.3):
        # every DataFrame over many partition directories builds an
        # InMemoryFileIndex, and above this path count Spark lists via
        # a DISTRIBUTED JOB — 632 one-file tasks cost ~1.3-1.7s of pure
        # task-scheduling overhead per read at sf0.1 (measured 3x: a
        # 632-dir read+count is 1.9-2.4s with the job vs 0.67s driver-
        # side), and the snapshot layout's partitioned tables (80-632
        # dirs) pay it on every probe/rewrite/read. The job exists for
        # object stores where one driver would serialize 10^4+ LIST
        # round trips; on local-fs/HDFS-class metadata, driver-side
        # listing wins to far higher counts. Parameterized: object-
        # store deployments set SPARK_GRAFT_LIST_JOB_THRESHOLD back
        # down (e.g. 1024 on S3), and the value only changes WHERE the
        # listing runs, never what is read.
        "spark.sql.sources.parallelPartitionDiscovery.threshold":
            os.environ.get("SPARK_GRAFT_LIST_JOB_THRESHOLD", "8192"),
        # Per-call DataFrame debug context (r17, guide §1.2 "per-task
        # work" applied to the DRIVER): when on, every DataFrame API
        # call pays a Python stack walk plus three py4j round-trips to
        # record its call site for error messages. A suite body makes
        # ~2k API calls per invocation, so plan CONSTRUCTION was paying
        # ~0.5-1 s/query of pure bookkeeping (measured via cProfile:
        # errors/utils.py wrapper = 0.8 s of tpch_join_suite's 3.9 s
        # build). Errors still carry the JVM-side context; only the
        # Python call-site annotation is dropped.
        "spark.python.sql.dataFrameDebugging.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
