"""Per-statement SQL working-memory governance (GridDB 5.7) and
processing-order control (GridDB 5.9).

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
server), and governance costs ONE consolidated polling thread per Spark
app no matter how many statements run concurrently (the poller walks the
module-level running-statement registry each tick).

GridDB 5.9 extends this into SQL resource scheduling
(``GridDB-5.9-CE-RELEASE_NOTES.md`` "SQL Resource Scheduling"): a node
config ``/sql/resourceControlLevel`` selects the scheduler —

- 0: automatic (defaults to level 3, the new scheduler)
- 1: legacy scheduler WITHOUT the SQL memory upper limit (V5.6 behavior)
- 2: legacy scheduler WITH the memory limit (V5.7/V5.8 behavior)
- 3: new scheduler — "assigns tasks as evenly as possible across SQL
  statements", i.e. fair scheduling at statement granularity, plus the
  memory limit

Spark has a native seat for each level: level 3 maps to the FAIR job
scheduler with ONE POOL PER GOVERNED STATEMENT (pools share the cluster's
task slots evenly, weight 1 each — exactly "tasks distributed fairly at
the SQL level"); levels 1/2 leave the statement in the default pool
(FIFO within a pool), with level 1 additionally disarming the kill.
5.9's resource monitoring ("output to event logs or meta tables") maps to
the module-level statement event stream: breaches, failures, and
completions are recorded and served via ``GridStore.statement_events()``.

5.9 Resource Monitoring thresholds (``/trace/resourceMonitor`` =
LEVEL_WARNING plus the four rate knobs,
``GridDB-5.9-CE-RELEASE_NOTES.md`` "Resource Monitoring"): statements
whose usage crosses ``rate × budget`` get a WARNING line in the event
log. The reference's four targets and the byte-proxy each maps to here:

- ``/sql/monitoringMemoryRate`` — "ratio of total memory consumption"
  → working set (peak execution memory + spill + shuffle write) vs
  ``rate × totalMemoryLimit``;
- ``/sql/monitoringStoreRate`` — "ratio of SQL intermediate store
  usage" → spill bytes (memory+disk spilled — intermediate results
  that escaped to the local store, the LocalTempStore analog) vs
  ``rate × totalMemoryLimit``;
- ``/sql/monitoringNetworkRate`` — the reference monitors transfer
  TIME per interval; executor transfer time isn't in the status store,
  so the proxy is transfer VOLUME (shuffle read+write bytes) vs
  ``rate × totalMemoryLimit`` — same intent (flag statements moving
  disproportionate data), different unit, documented here;
- ``/transaction/monitoringStoreRate`` — "datastore access volume
  (estimated) relative to datastore memory limit" → input bytes read
  from storage vs ``rate × totalMemoryLimit``.

A crossed threshold emits one ``STMT_MONITOR_{MEMORY,STORE,NETWORK,
DATASTORE}`` event per statement per category (the reference logs per
monitoring interval; once-per-statement bounds the event stream) —
served through ``#statement_events`` like the lifecycle events.

Node-scoped budget (``node_scope=True``): the reference's
``/sql/totalMemoryLimit`` is "Total SQL processing memory limit per
node" — ONE budget shared by every statement on the node, not a
per-statement allowance (GridDB-5.9-CE-RELEASE_NOTES.md "Execution
Control Based on Memory Usage"). A node-scoped governor compares the
SUM of the node's running statements' working sets — across EVERY
governor instance on the app, via the module-level registry, because
two instances must not each get a full allowance — to the limit; on
breach,
the 5.9 new scheduler (level 3) "automatically determines which SQL
statements to stop" — mapped as stop-the-largest-consumer, the choice
that frees the most memory per statement stopped — while the legacy
level 2 stops the statement whose growth tripped the total (V5.7
behavior: the statement "determined to require memory beyond the
limit" is terminated). Statements not selected continue unharmed.
The default (``node_scope=False``) keeps the per-statement allowance,
which doubles as the per-statement working-memory contract the 5.7
limiter arms around each processor operation.
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
    status: str = "RUNNING"  # RUNNING | DONE | FAILED | CANCELLED_MEMORY_LIMIT
    working_memory_bytes: int = 0
    finished_ms: int | None = None
    job_ids: list = field(default_factory=list)
    #: 5.9 /sql/resourceControlLevel in effect (already auto-resolved)
    control_level: int = 2
    #: FAIR scheduler pool the statement ran in (level 3), else None
    pool: str | None = None
    #: 5.9 resource monitoring ("memory, I/O, communication time, etc."):
    #: bytes read from storage and bytes moved over the wire (shuffle
    #: read+write), summed from the same status-store stages
    io_bytes: int = 0
    network_bytes: int = 0
    #: SQL intermediate-store usage (spill bytes — the LocalTempStore
    #: analog), the /sql/monitoringStoreRate target
    store_bytes: int = 0
    #: monitoring categories whose WARNING already fired (one event per
    #: statement per category)
    monitor_fired: set = field(default_factory=set)


@dataclass
class StatementEvent:
    """One 5.9 resource-monitoring event-log line ("The new scheduler can
    monitor detailed SQL resource usage ... and output it to event logs or
    meta tables" — GridDB-5.9-CE-RELEASE_NOTES.md Resource Monitoring)."""

    ts_ms: int
    request_id: str
    event_type: str  # STMT_START | STMT_DONE | STMT_FAIL | STMT_STOP_MEMORY_LIMIT
    detail: str


#: All governed statements this session, newest last — the
#: #statement_resources meta table serves these rows.
_RECORDS: list[StatementRecord] = []

#: Statement lifecycle/breach event stream, newest last — served via
#: GridStore.statement_events() (#statement_events).
_EVENTS: list[StatementEvent] = []

#: RUNNING governed statements per Spark application, keyed by job
#: group. Module-level like _RECORDS/_EVENTS because the reference's
#: /sql/totalMemoryLimit is a per-NODE budget: every MemoryGovernor on
#: one driver shares ONE allowance (two instances each getting a full
#: budget would silently double the node limit). Instances of the same
#: app alias the same inner dict as their ``_running`` view.
_NODE_RUNNING: dict[str, dict[str, StatementRecord]] = {}

#: Poll-dispatch ownership for the consolidated per-app poller: group id
#: → owning governor (whose config — budget scope, monitor rates,
#: enforcement level — that statement polls under). ONE daemon thread
#: per app walks these — a node running hundreds of concurrent governed
#: statements costs one polling thread, not one per statement (the
#: status-store reads are driver-local either way; the thread count was
#: the only per-statement cost). The statement RECORD itself lives only
#: in _NODE_RUNNING — each fact has one home, so the two maps cannot
#: disagree about a record, only about membership (a group present in
#: one map alone simply neither polls nor charges).
_POLL_ENTRIES: dict[str, dict[str, "MemoryGovernor"]] = {}

#: The live consolidated poller per app (started lazily, exits when its
#: entry table drains; both transitions happen under _NODE_LOCK so a
#: registration can never miss a poller that is about to exit).
_POLLERS: dict[str, threading.Thread] = {}

_NODE_LOCK = threading.RLock()


def _poll_loop(app_id: str) -> None:
    """The consolidated monitor: one pass over every RUNNING governed
    statement of this app per tick, each polled with its own governor's
    config (budget scope, monitor rates, enforcement level). Sleeps the
    smallest registered poll_interval; exits — deregistering itself under
    the lock — when the last statement finishes."""
    me = threading.current_thread()
    poll_fails: dict[str, int] = {}
    while True:
        with _NODE_LOCK:
            entries = list(_POLL_ENTRIES.get(app_id, {}).items())
            if not entries:
                if _POLLERS.get(app_id) is me:
                    _POLLERS.pop(app_id, None)
                return
            interval = min(gov.poll_interval for gov in
                           _POLL_ENTRIES[app_id].values())
            recs = dict(_NODE_RUNNING.get(app_id, {}))
        # drop failure counters for statements no longer registered: a
        # statement deregistered WHILE failing would otherwise leave its
        # counter behind for the life of the poller — unbounded growth
        # under statement churn in a long-lived app
        live = {g for g, _ in entries}
        for g in list(poll_fails):
            if g not in live:
                poll_fails.pop(g, None)
        for group_id, gov in entries:
            rec = recs.get(group_id)
            if rec is None or rec.status != "RUNNING":
                poll_fails.pop(group_id, None)
                continue
            try:
                gov._poll_once(group_id, rec)
                poll_fails.pop(group_id, None)
            except Exception as exc:
                # one statement's transient poll/enforcement failure
                # (e.g. a py4j hiccup in cancelJobGroup) must not kill
                # the app-wide monitor: every OTHER governed statement
                # would silently lose enforcement mid-flight. Skip the
                # tick; the next one retries with fresh state. A
                # PERSISTENT failure means this statement is running
                # un-enforced — that must be observable, not invisible:
                # emit a rate-limited STMT_MONITOR_ERROR event (first
                # failure, then every 50th consecutive one).
                n = poll_fails.get(group_id, 0) + 1
                poll_fails[group_id] = n
                if n == 1 or n % 50 == 0:
                    _emit(rec.request_id, "STMT_MONITOR_ERROR",
                          f"poll failed ({n} consecutive): "
                          f"{type(exc).__name__}: {exc}")
                continue
        time.sleep(interval)


def _register_running(gov: "MemoryGovernor", group_id: str,
                      rec: StatementRecord) -> None:
    with _NODE_LOCK:
        _NODE_RUNNING.setdefault(gov._app_id, {})[group_id] = rec
        _POLL_ENTRIES.setdefault(gov._app_id, {})[group_id] = gov
        poller = _POLLERS.get(gov._app_id)
        if poller is None or not poller.is_alive():
            poller = threading.Thread(
                target=_poll_loop, args=(gov._app_id,),
                name=f"griddb-governor-poller-{gov._app_id}", daemon=True,
            )
            _POLLERS[gov._app_id] = poller
            poller.start()


def _deregister_running(gov: "MemoryGovernor", group_id: str) -> None:
    with _NODE_LOCK:
        _NODE_RUNNING.get(gov._app_id, {}).pop(group_id, None)
        _POLL_ENTRIES.get(gov._app_id, {}).pop(group_id, None)


def statement_records() -> list[StatementRecord]:
    return list(_RECORDS)


def statement_events() -> list[StatementEvent]:
    return list(_EVENTS)


def _emit(request_id: str, event_type: str, detail: str = "") -> None:
    _EVENTS.append(StatementEvent(
        ts_ms=int(time.time() * 1000),
        request_id=request_id,
        event_type=event_type,
        detail=detail,
    ))


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
        resource_control_level: int = 0,
        resource_monitor: bool = False,
        monitoring_memory_rate: float = 0.0,
        monitoring_store_rate: float = 0.0,
        monitoring_network_rate: float = 0.0,
        tx_monitoring_store_rate: float = 0.0,
        node_scope: bool = False,
    ):
        if resource_control_level not in (0, 1, 2, 3):
            raise ValueError(
                "/sql/resourceControlLevel must be 0..3, got "
                f"{resource_control_level}"
            )
        rates = {
            "/sql/monitoringMemoryRate": monitoring_memory_rate,
            "/sql/monitoringStoreRate": monitoring_store_rate,
            "/sql/monitoringNetworkRate": monitoring_network_rate,
            "/transaction/monitoringStoreRate": tx_monitoring_store_rate,
        }
        for key, r in rates.items():
            if not 0.0 <= r <= 1.0:
                raise ValueError(f"{key} must be in 0..1 (0 disables), "
                                 f"got {r}")
        self.spark = spark
        self.total_memory_limit = int(total_memory_limit)
        self.fail_on_limit = fail_on_limit
        self.poll_interval = poll_interval
        self.resource_control_level = resource_control_level
        #: /trace/resourceMonitor = LEVEL_WARNING — master switch for the
        #: 5.9 monitoring warnings (rates are ignored while False, as the
        #: reference ignores the rate knobs without the trace level)
        self.resource_monitor = resource_monitor
        self.monitoring_memory_rate = monitoring_memory_rate
        self.monitoring_store_rate = monitoring_store_rate
        self.monitoring_network_rate = monitoring_network_rate
        self.tx_monitoring_store_rate = tx_monitoring_store_rate
        #: True = the budget is the reference's per-NODE total — summed
        #: across ALL governors' running statements on this app (the
        #: module-level registry), matching "Total SQL processing memory
        #: limit per node"; False = per-statement allowance
        self.node_scope = node_scope
        self._app_id = spark.sparkContext.applicationId
        #: live view of this NODE's running statements — aliased, not
        #: copied, so every MemoryGovernor instance of the same app sees
        #: (and charges against) the same set
        self._running: dict[str, StatementRecord] = \
            _NODE_RUNNING.setdefault(self._app_id, {})
        self._node_lock = _NODE_LOCK

    @property
    def effective_level(self) -> int:
        """0 = automatic configuration → level 3, the new scheduler
        (GridDB-5.9-CE-RELEASE_NOTES.md /sql/resourceControlLevel)."""
        return 3 if self.resource_control_level == 0 \
            else self.resource_control_level

    @property
    def _enforce(self) -> bool:
        """Level 1 is the V5.6 legacy scheduler WITHOUT the SQL memory
        upper limit — usage is still monitored/recorded, never killed."""
        return self.fail_on_limit and self.effective_level >= 2

    # -- status-store polling (driver-side only) -------------------------

    def _group_usage(
        self, group_id: str
    ) -> tuple[int, int, int, int, list]:
        """(working-set, io, network, store) bytes of the group's stages.

        Working set counts each stage's peak execution memory + spill +
        shuffle write; io = input bytes read from storage; network =
        shuffle read + write; store = spill bytes alone (the SQL
        intermediate-store usage /sql/monitoringStoreRate targets — the
        5.9 resource-monitoring detail set: "memory, I/O, communication
        time, etc."). All read from the driver's AppStatusStore (the
        store behind the UI — no extra instrumentation, no executor
        round-trips)."""
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
        total = io = net = spill = 0
        for sid in stage_ids:
            try:
                seq = store.stageData(sid, False, empty, False, None)
            except Exception:
                continue  # stage evicted/unknown: skip, never fail the poll
            it = seq.iterator()
            while it.hasNext():
                s = it.next()
                stage_spill = int(
                    s.memoryBytesSpilled() + s.diskBytesSpilled()
                )
                total += int(
                    s.peakExecutionMemory() + s.shuffleWriteBytes()
                ) + stage_spill
                io += int(s.inputBytes())
                net += int(s.shuffleReadBytes() + s.shuffleWriteBytes())
                spill += stage_spill
        return total, io, net, spill, list(jobs)

    def _check_monitor(self, rec: StatementRecord) -> None:
        """Emit the 5.9 resource-monitoring WARNING events for every
        enabled rate whose threshold the statement has crossed (once per
        statement per category)."""
        if not self.resource_monitor:
            return
        budget = self.total_memory_limit
        checks = (
            ("MEMORY", self.monitoring_memory_rate,
             rec.working_memory_bytes, "/sql/monitoringMemoryRate"),
            ("STORE", self.monitoring_store_rate,
             rec.store_bytes, "/sql/monitoringStoreRate"),
            ("NETWORK", self.monitoring_network_rate,
             rec.network_bytes, "/sql/monitoringNetworkRate"),
            ("DATASTORE", self.tx_monitoring_store_rate,
             rec.io_bytes, "/transaction/monitoringStoreRate"),
        )
        for cat, rate, observed, key in checks:
            if rate <= 0.0:
                continue
            threshold = rate * budget
            if observed > threshold:
                # check-and-mark under the lock: a monitor thread that
                # outlived its join timeout must not double-emit against
                # run()'s own post-action check
                with self._node_lock:
                    if cat in rec.monitor_fired:
                        continue
                    rec.monitor_fired.add(cat)
                _emit(rec.request_id, f"STMT_MONITOR_{cat}",
                      f"observed={observed};threshold={int(threshold)};"
                      f"rate={rate};config={key}")

    def _poll_once(self, group_id: str, rec: StatementRecord) -> None:
        """One monitor tick for one RUNNING statement — called by the
        consolidated per-app poller (:func:`_poll_loop`), never from a
        per-statement thread."""
        sc = self.spark.sparkContext
        try:
            usage, io, net, spill, jobs = self._group_usage(group_id)
        except Exception:
            return  # transient status-store hiccup: skip, never fail
        rec.job_ids = jobs
        rec.io_bytes = max(rec.io_bytes, io)
        rec.network_bytes = max(rec.network_bytes, net)
        rec.store_bytes = max(rec.store_bytes, spill)
        grew = usage > rec.working_memory_bytes
        if grew:
            rec.working_memory_bytes = usage
        self._check_monitor(rec)
        if not self._enforce:
            return
        if self.node_scope:
            self._enforce_node(rec, sc, grew)
            return
        if usage > self.total_memory_limit:
            rec.status = "CANCELLED_MEMORY_LIMIT"
            _emit(rec.request_id, "STMT_STOP_MEMORY_LIMIT",
                  f"workingMemory={usage};"
                  f"totalMemoryLimit={self.total_memory_limit}")
            sc.cancelJobGroup(group_id)

    def _enforce_node(self, rec: StatementRecord, sc,
                      grew: bool) -> bool:
        """Node-scoped budget check: when the SUM of running statements'
        working sets exceeds /sql/totalMemoryLimit, stop ONE statement —
        the largest consumer under the 5.9 new scheduler ("automatically
        determines which SQL statements to stop"), or the statement whose
        GROWTH tripped the total under legacy level 2 (V5.7 allocator
        semantics: the allocation that pushes past the limit is the one
        that fails — so a steady-state statement polling after someone
        else's growth is never the victim; ``grew`` says whether this
        poll observed rec's own working set increase).
        Returns True when the stopped statement is ``rec`` itself."""
        with self._node_lock:
            live = [r for r in self._running.values()
                    if r.status == "RUNNING"]
            total = sum(r.working_memory_bytes for r in live)
            if total <= self.total_memory_limit or not live:
                return False
            if self.effective_level >= 3:
                victim = max(live, key=lambda r: (r.working_memory_bytes,
                                                  r.request_id))
            elif grew:
                victim = rec
            else:
                # legacy scope: rec didn't grow this poll — the grower's
                # own monitor will take the failure, as its allocation did
                return False
            victim.status = "CANCELLED_MEMORY_LIMIT"
            _emit(victim.request_id, "STMT_STOP_MEMORY_LIMIT",
                  f"workingMemory={victim.working_memory_bytes};"
                  f"nodeTotal={total};"
                  f"totalMemoryLimit={self.total_memory_limit};"
                  f"scope=node;selection="
                  + ("largest" if self.effective_level >= 3 else "breaching"))
        sc.cancelJobGroup(victim.request_id)
        return victim is rec

    # -- statement execution --------------------------------------------

    def run(self, action, statement: str = ""):
        """Run ``action`` (a callable performing the Spark action — e.g.
        ``lambda: df.collect()``) as one governed statement. Returns the
        action's result, or raises :class:`StatementMemoryLimitError` when
        the budget is breached with fail-on-limit armed."""
        sc = self.spark.sparkContext
        group_id = f"griddb-stmt-{uuid.uuid4().hex[:12]}"
        level = self.effective_level
        rec = StatementRecord(
            request_id=group_id,
            statement=statement,
            limit_bytes=self.total_memory_limit,
            fail_on_limit=self.fail_on_limit,
            started_ms=int(time.time() * 1000),
            control_level=level,
            # level 3 = the 5.9 new scheduler: one FAIR pool per statement,
            # so concurrent statements' tasks interleave evenly instead of
            # queueing FIFO behind each other (processing-order control)
            pool=group_id if level == 3 else None,
        )
        _RECORDS.append(rec)
        _register_running(self, group_id, rec)
        _emit(group_id, "STMT_START",
              f"resourceControlLevel={level};"
              f"totalMemoryLimit={self.total_memory_limit};"
              f"scope={'node' if self.node_scope else 'statement'}")
        sc.setJobGroup(group_id, statement or "governed statement",
                       interruptOnCancel=True)
        if rec.pool is not None:
            sc.setLocalProperty("spark.scheduler.pool", rec.pool)
        try:
            result = action()
        except Exception as exc:
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
            _emit(group_id, "STMT_FAIL", f"{type(exc).__name__}: {exc}")
            raise
        finally:
            sc._jsc.clearJobGroup()
            if rec.pool is not None:
                sc.setLocalProperty("spark.scheduler.pool", None)
            _deregister_running(self, group_id)
        rec.finished_ms = int(time.time() * 1000)
        # a statement that finished between polls still gets the check —
        # GridDB's limiter accounts synchronously, so a breach must fail
        # deterministically regardless of monitor timing
        try:
            usage, io, net, spill, jobs = self._group_usage(group_id)
        except Exception:
            usage, jobs = rec.working_memory_bytes, rec.job_ids
            io, net = rec.io_bytes, rec.network_bytes
            spill = rec.store_bytes
        rec.job_ids = jobs or rec.job_ids
        rec.working_memory_bytes = max(rec.working_memory_bytes, usage)
        rec.io_bytes = max(rec.io_bytes, io)
        rec.network_bytes = max(rec.network_bytes, net)
        rec.store_bytes = max(rec.store_bytes, spill)
        # a threshold crossed between polls still warns — same
        # deterministic post-action check as the memory limit itself
        self._check_monitor(rec)
        # a node-scope victim whose action won the race against the
        # cancel still fails — it WAS selected to stop. (Statement scope
        # falls through to the per-statement check below, which raises
        # with the per-statement working-memory message.)
        if self.node_scope and rec.status == "CANCELLED_MEMORY_LIMIT":
            raise StatementMemoryLimitError(
                f"SQL statement stopped: node SQL memory exceeded "
                f"/sql/totalMemoryLimit={self.total_memory_limit} "
                f"(failOnTotalMemoryLimit=true; this statement selected)"
            )
        # a breach fails even when the action won the race against the
        # cancel (or finished between polls) — GridDB's limiter accounts
        # synchronously, so a breach is deterministic regardless of
        # timing. Holds in BOTH scopes: under node scope a statement
        # exceeding the whole node budget single-handedly is itself a
        # node breach (V5.7 semantics: the statement requiring memory
        # beyond the limit is the one terminated).
        if (self._enforce
                and rec.working_memory_bytes > self.total_memory_limit):
            rec.status = "CANCELLED_MEMORY_LIMIT"
            if not any(e.request_id == group_id
                       and e.event_type == "STMT_STOP_MEMORY_LIMIT"
                       for e in _EVENTS):
                _emit(group_id, "STMT_STOP_MEMORY_LIMIT",
                      f"workingMemory={rec.working_memory_bytes};"
                      f"totalMemoryLimit={self.total_memory_limit}")
            raise StatementMemoryLimitError(
                f"SQL statement stopped: working memory "
                f"{rec.working_memory_bytes} exceeded "
                f"/sql/totalMemoryLimit={self.total_memory_limit} "
                f"(failOnTotalMemoryLimit=true)"
            )
        rec.status = "DONE"
        _emit(group_id, "STMT_DONE",
              f"workingMemory={rec.working_memory_bytes};"
              f"actualTimeMs={rec.finished_ms - rec.started_ms}")
        return result
