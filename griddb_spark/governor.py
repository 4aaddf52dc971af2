"""Per-statement SQL working-memory governance (GridDB 5.7).

GridDB 5.7 adds ``/sql/totalMemoryLimit`` (a working-memory budget for
one SQL statement) and ``/sql/failOnTotalMemoryLimit`` (when true, a
statement that exceeds the budget is stopped with an error) —
``docs/GridDB-5.7-CE-RELEASE_NOTES.md:29-38``. Server-side the budget is
enforced by a per-statement allocation limiter with fail-on-excess armed
while the statement's tasks run (``sql_job_manager.cpp:402-404`` wires the
config; ``sql_job_manager_priority.cpp:7218-7232`` arms
``setFailOnExcess`` around each processor operation).

Spark mapping — statement scope is the *job group*:

- the statement runs under a unique job group with interrupt-on-cancel;
- a driver-side monitor thread polls the app status store's per-stage
  executor metrics restricted to the group's jobs and sums the working
  set: ``peakExecutionMemory`` (operator working memory — the closest
  analog of GridDB's allocator reservation) plus ``memoryBytesSpilled`` /
  ``diskBytesSpilled`` / ``shuffleWriteBytes`` (memory pressure that
  escaped to disk/network — spill is precisely the signal that the
  statement outgrew its budget);
- on breach with ``fail_on_limit`` the group is cancelled and the
  statement surfaces :class:`StatementMemoryLimitError`; a statement that
  finishes between polls still fails the final post-action check, so
  enforcement is deterministic for short statements too;
- every governed run is recorded and served through the
  ``#statement_resources`` meta table (``resource_restrictions`` carries
  the GridDB config keys; ``memory_use`` the observed working set), the
  same table the reference extended in 5.7.

At scale nothing here adds distributed work: the monitor reads driver-side
status-store state (already maintained by Spark for the UI/history
server), so governance costs one polling thread per running statement.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


class StatementMemoryLimitError(RuntimeError):
    """The statement exceeded /sql/totalMemoryLimit with
    /sql/failOnTotalMemoryLimit=true (GridDB stops the SQL —
    GridDB-5.7-CE-RELEASE_NOTES.md:31)."""


@dataclass
class StatementRecord:
    request_id: str
    statement: str
    limit_bytes: int
    fail_on_limit: bool
    started_ms: int
    status: str = "RUNNING"  # RUNNING | DONE | CANCELLED_MEMORY_LIMIT
    working_memory_bytes: int = 0
    finished_ms: int | None = None
    job_ids: list = field(default_factory=list)


#: All governed statements this session, newest last — the
#: #statement_resources meta table serves these rows.
_RECORDS: list[StatementRecord] = []


def statement_records() -> list[StatementRecord]:
    return list(_RECORDS)


class MemoryGovernor:
    """Runs statements under a working-memory budget.

    ``total_memory_limit`` / ``fail_on_limit`` mirror GridDB's
    ``/sql/totalMemoryLimit`` + ``/sql/failOnTotalMemoryLimit`` node
    config (5.7). One governor may run many statements; each gets its own
    job group and record.
    """

    def __init__(
        self,
        spark: SparkSession,
        total_memory_limit: int,
        fail_on_limit: bool = True,
        poll_interval: float = 0.05,
    ):
        self.spark = spark
        self.total_memory_limit = int(total_memory_limit)
        self.fail_on_limit = fail_on_limit
        self.poll_interval = poll_interval

    # -- status-store polling (driver-side only) -------------------------

    def _group_usage(self, group_id: str) -> tuple[int, list]:
        """Working-set bytes of every stage belonging to the group's jobs.

        Counts each stage's peak execution memory + spill + shuffle write,
        read from the driver's AppStatusStore (the store behind the UI —
        no extra instrumentation, no executor round-trips)."""
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(group_id) or []
        stage_ids: set[int] = set()
        for jid in jobs:
            ji = tracker.getJobInfo(jid)
            if ji is not None:
                stage_ids.update(ji.stageIds)
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.Collections.emptyList()
        total = 0
        for sid in stage_ids:
            try:
                seq = store.stageData(sid, False, empty, False, None)
            except Exception:
                continue  # stage evicted/unknown: skip, never fail the poll
            it = seq.iterator()
            while it.hasNext():
                s = it.next()
                total += int(
                    s.peakExecutionMemory()
                    + s.memoryBytesSpilled()
                    + s.diskBytesSpilled()
                    + s.shuffleWriteBytes()
                )
        return total, list(jobs)

    def _monitor(self, group_id: str, rec: StatementRecord,
                 stop: threading.Event) -> None:
        sc = self.spark.sparkContext
        while not stop.wait(self.poll_interval):
            try:
                usage, jobs = self._group_usage(group_id)
            except Exception:
                continue
            rec.job_ids = jobs
            if usage > rec.working_memory_bytes:
                rec.working_memory_bytes = usage
            if self.fail_on_limit and usage > self.total_memory_limit:
                rec.status = "CANCELLED_MEMORY_LIMIT"
                sc.cancelJobGroup(group_id)
                return

    # -- statement execution --------------------------------------------

    def run(self, action, statement: str = ""):
        """Run ``action`` (a callable performing the Spark action — e.g.
        ``lambda: df.collect()``) as one governed statement. Returns the
        action's result, or raises :class:`StatementMemoryLimitError` when
        the budget is breached with fail-on-limit armed."""
        sc = self.spark.sparkContext
        group_id = f"griddb-stmt-{uuid.uuid4().hex[:12]}"
        rec = StatementRecord(
            request_id=group_id,
            statement=statement,
            limit_bytes=self.total_memory_limit,
            fail_on_limit=self.fail_on_limit,
            started_ms=int(time.time() * 1000),
        )
        _RECORDS.append(rec)
        stop = threading.Event()
        mon = threading.Thread(
            target=self._monitor, args=(group_id, rec, stop), daemon=True
        )
        sc.setJobGroup(group_id, statement or "governed statement",
                       interruptOnCancel=True)
        mon.start()
        try:
            result = action()
        except Exception as exc:
            stop.set()
            mon.join(timeout=5)
            rec.finished_ms = int(time.time() * 1000)
            if rec.status == "CANCELLED_MEMORY_LIMIT":
                raise StatementMemoryLimitError(
                    f"SQL statement stopped: working memory "
                    f"{rec.working_memory_bytes} exceeded "
                    f"/sql/totalMemoryLimit={self.total_memory_limit} "
                    f"(failOnTotalMemoryLimit=true)"
                ) from exc
            # a statement that raised for any non-memory reason is FAILED,
            # not DONE — #statement_resources must not report crashed or
            # externally-cancelled statements as successful
            rec.status = "FAILED"
            raise
        finally:
            sc._jsc.clearJobGroup()
        stop.set()
        mon.join(timeout=5)
        rec.finished_ms = int(time.time() * 1000)
        # a statement that finished between polls still gets the check —
        # GridDB's limiter accounts synchronously, so a breach must fail
        # deterministically regardless of monitor timing
        try:
            usage, jobs = self._group_usage(group_id)
        except Exception:
            usage, jobs = rec.working_memory_bytes, rec.job_ids
        rec.job_ids = jobs or rec.job_ids
        rec.working_memory_bytes = max(rec.working_memory_bytes, usage)
        # a breach fails even when the action won the race against the
        # cancel (or finished between polls) — GridDB's limiter accounts
        # synchronously, so a breach is deterministic regardless of timing
        if (self.fail_on_limit
                and rec.working_memory_bytes > self.total_memory_limit):
            rec.status = "CANCELLED_MEMORY_LIMIT"
            raise StatementMemoryLimitError(
                f"SQL statement stopped: working memory "
                f"{rec.working_memory_bytes} exceeded "
                f"/sql/totalMemoryLimit={self.total_memory_limit} "
                f"(failOnTotalMemoryLimit=true)"
            )
        rec.status = "DONE"
        return result
