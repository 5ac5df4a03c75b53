"""Orchestration contract: the process_log ledger and stage gating.

Reproduces the reference's control-DB handshake (SURVEY.md section 3.4):
linear DAG P1 -> P2 -> P3 -> P4, each stage writes RUNNING at start and
SUCCESS/FAILED at end, and a stage only starts when its predecessor's
latest row is SUCCESS (StagingDW/.../StagingController.java:41-67,
transform_staging/.../LotteryTransform.java:26-40, ETLMain.java:89-111).

The ledger is a parquet table appended per event; gating checks are pure
DataFrame reads, no driver-side SQL.
"""

from __future__ import annotations

import datetime as _dt
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..schemas import PROCESS_LOG

_STAGES = ("P1", "P2", "P3", "P4")


class ProcessLog:
    """Append-only run ledger with predecessor-SUCCESS / self-not-RUNNING
    gating."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- reads ------------------------------------------------------------
    def read(self) -> DataFrame:
        # Existence is probed through Spark itself (AnalysisException on a
        # missing path), not os.path — the ledger may live on HDFS/S3 where
        # a driver-local filesystem check would silently say "absent" and
        # bypass all gating.
        try:
            df = self.spark.read.schema(PROCESS_LOG).parquet(self.path)
            df.isEmpty()  # force path resolution now
            return df
        except AnalysisException:
            return self.spark.createDataFrame([], PROCESS_LOG)

    def latest_status(self, process_code: str) -> str | None:
        row = (
            self.read()
            .filter(F.col("process_code") == process_code)
            .orderBy(F.col("process_id").desc())
            .limit(1)
            .collect()
        )
        return row[0]["status"] if row else None

    def can_start(self, process_code: str) -> bool:
        """Predecessor-SUCCESS gate + self-not-RUNNING guard. GATED rows
        (a gated-out attempt) do not count as terminal state: the latest
        *non-GATED* row decides, so a rejected attempt can't flip a stage
        that is still RUNNING into apparently-FAILED."""
        idx = _STAGES.index(process_code)
        if self._latest_effective_status(process_code) == "RUNNING":
            return False
        if idx == 0:
            return True
        return self._latest_effective_status(_STAGES[idx - 1]) == "SUCCESS"

    def _latest_effective_status(self, process_code: str) -> str | None:
        row = (
            self.read()
            .filter(
                (F.col("process_code") == process_code)
                & (F.col("status") != "GATED")
            )
            .orderBy(F.col("process_id").desc())
            .limit(1)
            .collect()
        )
        return row[0]["status"] if row else None

    # -- writes -----------------------------------------------------------
    @staticmethod
    def _next_id() -> int:
        # Monotonic wall-clock id: unique under concurrent writers (ns
        # resolution), time-ordered, and needs no read-max-then-append
        # round trip (which was racy).
        return time.time_ns()

    def log(
        self,
        process_code: str,
        status: str,
        source_id: int = 1,
        message: str | None = None,
        started_at: _dt.datetime | None = None,
    ) -> int:
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        pid = self._next_id()
        row = [(pid, source_id, process_code, status, started_at or now, now, message)]
        self.spark.createDataFrame(row, PROCESS_LOG).write.mode("append").parquet(self.path)
        return pid

    # -- the reference's run shape ----------------------------------------
    def run_stage(self, process_code: str, fn, *args, **kwargs):
        """RUNNING -> fn() -> SUCCESS(+message) | FAILED(+error), with gating.
        Returns fn's result; raises RuntimeError when gated out. A gated-out
        attempt is recorded as GATED (not FAILED) so it never masks the
        in-flight run's real status."""
        if not self.can_start(process_code):
            self.log(process_code, "GATED", message="gate: predecessor not SUCCESS or self RUNNING")
            raise RuntimeError(f"{process_code} gated: predecessor not SUCCESS or already RUNNING")
        started = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        self.log(process_code, "RUNNING", started_at=started)
        try:
            result = fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — ledger must record any failure
            self.log(process_code, "FAILED", message=str(e)[:500], started_at=started)
            raise
        msg = f"rows={result}" if isinstance(result, int) else "ok"
        self.log(process_code, "SUCCESS", message=msg, started_at=started)
        return result
