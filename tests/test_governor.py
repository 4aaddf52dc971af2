"""Per-statement memory governance (GridDB 5.7 /sql/totalMemoryLimit +
/sql/failOnTotalMemoryLimit — GridDB-5.7-CE-RELEASE_NOTES.md:29-38)."""

import os

import pytest

from griddb_spark.governor import (
    MemoryGovernor,
    StatementMemoryLimitError,
    statement_records,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _heavy(spark):
    """A statement with a real shuffle working set (grouped aggregation
    over a generated range — stable regardless of testdata SF)."""
    return (
        spark.range(0, 2_000_000)
        .selectExpr("id", "id % 10000 AS k", "id * 2 AS v")
        .groupBy("k")
        .sum("v")
    )


def test_budget_breach_aborts_with_griddb_error(spark):
    gov = MemoryGovernor(spark, total_memory_limit=64 * 1024,
                         fail_on_limit=True)
    df = _heavy(spark)
    with pytest.raises(StatementMemoryLimitError) as ei:
        gov.run(lambda: df.collect(), statement="SELECT heavy")
    assert "totalMemoryLimit" in str(ei.value)
    rec = statement_records()[-1]
    assert rec.status == "CANCELLED_MEMORY_LIMIT"
    assert rec.working_memory_bytes > 64 * 1024
    assert rec.statement == "SELECT heavy"


def test_statement_under_budget_completes(spark):
    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                         fail_on_limit=True)
    out = gov.run(lambda: _heavy(spark).count(), statement="SELECT ok")
    assert out == 10000
    rec = statement_records()[-1]
    assert rec.status == "DONE"
    assert rec.working_memory_bytes > 0  # usage observed, not just zeroed


def test_monitor_only_mode_records_without_killing(spark):
    """failOnTotalMemoryLimit=false: the budget is monitoring-only — the
    statement completes and the breach is visible in the record."""
    gov = MemoryGovernor(spark, total_memory_limit=64 * 1024,
                         fail_on_limit=False)
    out = gov.run(lambda: _heavy(spark).count(), statement="SELECT watch")
    assert out == 10000
    rec = statement_records()[-1]
    assert rec.status == "DONE"
    assert rec.working_memory_bytes > 64 * 1024


def test_statement_resources_serves_governed_rows(spark):
    """#statement_resources (the 5.7 meta table this feature reports
    through) must carry one row per governed statement with the GridDB
    config keys in resource_restrictions and the working set in
    memory_use."""
    from griddb_spark.container import GridStore

    gov = MemoryGovernor(spark, total_memory_limit=1024 ** 3,
                         fail_on_limit=True)
    gov.run(lambda: _heavy(spark).count(), statement="SELECT meta probe")
    store = GridStore(spark, SF_DIR)
    rows = store.statement_resources().where(
        "statement_type = 'SQL'").collect()
    assert rows, "governed statements missing from #statement_resources"
    mine = [r for r in rows if r.statement == "SELECT meta probe"]
    assert mine
    r = mine[-1]
    assert "totalMemoryLimit=" in r.resource_restrictions
    assert "failOnTotalMemoryLimit=true" in r.resource_restrictions
    assert "status=DONE" in r.resource_restrictions
    assert r.memory_use > 0
    # cancelled statements surface their outcome too
    df = _heavy(spark)
    bad = MemoryGovernor(spark, total_memory_limit=64 * 1024)
    with pytest.raises(StatementMemoryLimitError):
        bad.run(lambda: df.collect(), statement="SELECT killed")
    rows = store.statement_resources().where(
        "statement = 'SELECT killed'").collect()
    assert rows and "status=CANCELLED_MEMORY_LIMIT" in \
        rows[-1].resource_restrictions


def test_governed_sql_frontend_statement(spark, catalog):
    """End-to-end through the SQL front-end: griddb_sql under a governor
    budget — generous budget returns correct rows, starved budget stops
    the statement with the GridDB-style error."""
    from griddb_spark.sql.translate import griddb_sql

    q = ("SELECT o_orderpriority, count(*) AS n FROM orders "
         "GROUP BY o_orderpriority")
    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3)
    rows = gov.run(lambda: griddb_sql(spark, catalog, q).collect(),
                   statement=q)
    assert len(rows) == 5
    starved = MemoryGovernor(spark, total_memory_limit=1)
    with pytest.raises(StatementMemoryLimitError):
        starved.run(lambda: griddb_sql(spark, catalog, q).collect(),
                    statement=q)


def test_non_memory_failure_records_failed_not_done(spark):
    """A statement that raises for a non-memory reason must surface as
    FAILED in the records — never DONE (a crashed statement is not a
    successful one)."""
    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3)

    def _boom():
        raise ValueError("user error, not a memory breach")

    with pytest.raises(ValueError):
        gov.run(_boom, statement="SELECT crash probe")
    rec = [r for r in statement_records()
           if r.statement == "SELECT crash probe"][-1]
    assert rec.status == "FAILED"
    assert rec.finished_ms is not None


# -- 5.9 processing-order control (/sql/resourceControlLevel) ------------


def test_resource_control_level_validation(spark):
    with pytest.raises(ValueError):
        MemoryGovernor(spark, total_memory_limit=1, resource_control_level=5)


def test_level3_assigns_statement_pool(spark):
    """Level 3 (and level 0 = auto -> 3) runs the statement in its own
    FAIR scheduler pool; levels 1/2 leave the default pool."""
    sc = spark.sparkContext

    def _observed_pool():
        # read the thread-local property the governor set for this statement
        return [sc.getLocalProperty("spark.scheduler.pool"),
                spark.range(10).count()][0]

    for lvl in (0, 3):
        gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                             resource_control_level=lvl)
        pool = gov.run(_observed_pool, statement=f"SELECT lvl{lvl}")
        rec = statement_records()[-1]
        assert pool is not None and pool.startswith("griddb-stmt-")
        assert rec.pool == pool and rec.control_level == 3
    for lvl in (1, 2):
        gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                             fail_on_limit=(lvl == 2),
                             resource_control_level=lvl)
        pool = gov.run(_observed_pool, statement=f"SELECT lvl{lvl}")
        rec = statement_records()[-1]
        assert pool is None and rec.pool is None
        assert rec.control_level == lvl
    # the pool property does not leak past the governed statement
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_level1_disables_memory_kill(spark):
    """Level 1 = V5.6 legacy scheduler WITHOUT the SQL memory upper
    limit: a starved budget is monitored but never kills."""
    gov = MemoryGovernor(spark, total_memory_limit=1, fail_on_limit=True,
                         resource_control_level=1)
    n = gov.run(lambda: _heavy(spark).count(), statement="SELECT lvl1 heavy")
    assert n == 10000
    rec = statement_records()[-1]
    assert rec.status == "DONE"
    assert rec.working_memory_bytes > 1  # breach observed, not enforced


def test_killed_statement_leaves_event_row(spark):
    """5.9 resource monitoring: a forcibly-stopped statement writes an
    event-log line, served via GridStore.statement_events()."""
    from griddb_spark.container import GridStore
    from griddb_spark.governor import statement_events

    gov = MemoryGovernor(spark, total_memory_limit=64 * 1024)
    with pytest.raises(StatementMemoryLimitError):
        gov.run(lambda: _heavy(spark).collect(),
                statement="SELECT killed for events")
    rec = statement_records()[-1]
    evs = [e for e in statement_events() if e.request_id == rec.request_id]
    kinds = [e.event_type for e in evs]
    assert "STMT_START" in kinds
    assert "STMT_STOP_MEMORY_LIMIT" in kinds
    stop = [e for e in evs if e.event_type == "STMT_STOP_MEMORY_LIMIT"][-1]
    assert "totalMemoryLimit=65536" in stop.detail
    df = GridStore(spark, SF_DIR).statement_events()
    got = df.where(f"request_id = '{rec.request_id}' AND "
                   "event_type = 'STMT_STOP_MEMORY_LIMIT'").collect()
    assert got and got[-1].detail == stop.detail


def test_concurrent_statements_fair_pools(spark):
    """Two concurrent level-3 statements get DISTINCT pools and both
    complete with correct results (the processing-order-control gate
    sql_resource_control value-hashes the data side)."""
    import threading

    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                         resource_control_level=3)
    results = {}

    def _run(tag, mod):
        results[tag] = gov.run(
            lambda: spark.range(0, 500_000)
            .selectExpr(f"id % {mod} AS k").groupBy("k").count().count(),
            statement=f"SELECT fair {tag}",
        )

    ts = [threading.Thread(target=_run, args=("a", 97)),
          threading.Thread(target=_run, args=("b", 61))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == {"a": 97, "b": 61}
    recs = [r for r in statement_records()
            if r.statement.startswith("SELECT fair")]
    pools = {r.pool for r in recs[-2:]}
    assert len(pools) == 2 and None not in pools
    assert all(r.status == "DONE" for r in recs[-2:])


def test_governed_statement_reports_io_and_network(spark):
    """5.9 resource monitoring detail set ('memory, I/O, communication
    time, etc.'): a governed statement that scans parquet and shuffles
    reports nonzero data_store_access and network_transfer_size in
    #statement_resources."""
    import os as _os

    from griddb_spark.container import GridStore

    path = _os.path.join(SF_DIR, "orders.parquet")
    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3)
    gov.run(
        lambda: spark.read.parquet(path)
        .groupBy("o_orderstatus").count().collect(),
        statement="SELECT io probe",
    )
    rows = GridStore(spark, SF_DIR).statement_resources().where(
        "statement = 'SELECT io probe'").collect()
    assert rows
    r = rows[-1]
    assert r.data_store_access > 0, "parquet scan bytes missing"
    assert r.network_transfer_size > 0, "shuffle bytes missing"


def test_monitor_rates_emit_warning_events(spark):
    """5.9 Resource Monitoring (/trace/resourceMonitor=LEVEL_WARNING +
    /sql/monitoring*Rate): a statement crossing rate x budget leaves one
    STMT_MONITOR_* warning per category in the event stream."""
    from griddb_spark.governor import statement_events

    gov = MemoryGovernor(
        spark, total_memory_limit=8 * 1024 ** 3, resource_monitor=True,
        monitoring_memory_rate=1e-9, monitoring_network_rate=1e-9,
        tx_monitoring_store_rate=1e-9,
    )
    path = os.path.join(SF_DIR, "orders.parquet")
    gov.run(
        lambda: spark.read.parquet(path)
        .groupBy("o_orderstatus").count().collect(),
        statement="SELECT monitor probe",
    )
    rec = statement_records()[-1]
    evs = [e for e in statement_events() if e.request_id == rec.request_id]
    types = [e.event_type for e in evs]
    # memory is always observed; the scan makes io nonzero; the groupBy
    # makes shuffle bytes nonzero — all three thresholds (1e-9 x 8GiB
    # ~= 8 bytes) must have fired exactly once
    for cat in ("STMT_MONITOR_MEMORY", "STMT_MONITOR_NETWORK",
                "STMT_MONITOR_DATASTORE"):
        assert types.count(cat) == 1, (cat, types)
    detail = next(e.detail for e in evs
                  if e.event_type == "STMT_MONITOR_MEMORY")
    assert "config=/sql/monitoringMemoryRate" in detail
    assert rec.status == "DONE"  # monitoring warns, never kills


def test_monitor_rate_zero_disables_and_switch_gates(spark):
    """Rate 0 disables a category (the reference's contract), and the
    /trace/resourceMonitor master switch gates all of them."""
    from griddb_spark.governor import statement_events

    # switch off: rates set, no events
    gov = MemoryGovernor(
        spark, total_memory_limit=8 * 1024 ** 3, resource_monitor=False,
        monitoring_memory_rate=1e-9,
    )
    gov.run(lambda: _heavy(spark).count(), statement="SELECT no monitor")
    rec = statement_records()[-1]
    assert not [e for e in statement_events()
                if e.request_id == rec.request_id
                and e.event_type.startswith("STMT_MONITOR_")]
    # switch on, memory rate only: exactly the memory category fires
    gov = MemoryGovernor(
        spark, total_memory_limit=8 * 1024 ** 3, resource_monitor=True,
        monitoring_memory_rate=1e-9,
    )
    gov.run(lambda: _heavy(spark).count(), statement="SELECT mem only")
    rec = statement_records()[-1]
    fired = {e.event_type for e in statement_events()
             if e.request_id == rec.request_id
             and e.event_type.startswith("STMT_MONITOR_")}
    assert fired == {"STMT_MONITOR_MEMORY"}


def test_monitor_rate_validation(spark):
    with pytest.raises(ValueError):
        MemoryGovernor(spark, total_memory_limit=1,
                       monitoring_memory_rate=1.5)
    with pytest.raises(ValueError):
        MemoryGovernor(spark, total_memory_limit=1,
                       monitoring_network_rate=-0.1)


def test_spill_recorded_as_store_bytes(spark):
    """sql_store_use in #statement_resources carries the statement's
    spill bytes (the SQL intermediate-store analog). A generated-range
    aggregation under default memory never spills in this harness, so
    assert the plumbing: the record field exists, defaults to 0, and the
    meta table serves it."""
    from griddb_spark.container import GridStore

    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3)
    gov.run(lambda: _heavy(spark).count(), statement="SELECT store probe")
    rec = statement_records()[-1]
    assert rec.store_bytes >= 0
    row = GridStore(spark, SF_DIR).statement_resources().where(
        "statement = 'SELECT store probe'").collect()[-1]
    assert row.sql_store_use == rec.store_bytes


def _sized(spark, rows: int, distinct: bool = False):
    """A statement whose working set scales with ``rows`` when
    ``distinct`` (per-key hash-agg entries = rows); a 10k-key map-side
    combine otherwise (working set ~10 MB at any row count)."""
    key = "id AS k" if distinct else "id % 10000 AS k"
    return (
        spark.range(0, rows)
        .selectExpr(key, "id * 2 AS v")
        .groupBy("k")
        .sum("v")
    )


def test_node_scope_stops_largest_consumer(spark):
    """5.9 node-scoped budget: /sql/totalMemoryLimit is the node TOTAL;
    on breach the new scheduler 'automatically determines which SQL
    statements to stop' — the largest consumer dies, the smaller
    statement completes. (Measured working sets: the distinct-key agg
    holds ~2.7 GB, the 10k-key agg ~10 MB — a 256 MiB node budget is
    generous for the small statement and hopeless for the pair.)"""
    import threading

    gov = MemoryGovernor(spark, total_memory_limit=256 * 1024 * 1024,
                         node_scope=True, resource_control_level=3,
                         poll_interval=0.02)
    results: dict = {}

    def _run(tag, rows, distinct):
        try:
            results[tag] = gov.run(
                lambda: _sized(spark, rows, distinct).count(),
                statement=f"SELECT node {tag}")
        except StatementMemoryLimitError as e:
            results[tag] = e

    big = threading.Thread(target=_run, args=("big", 16_000_000, True))
    small = threading.Thread(target=_run, args=("small", 2_000_000, False))
    big.start()
    small.start()
    big.join()
    small.join()
    assert isinstance(results["big"], StatementMemoryLimitError), results
    assert results["small"] == 10000, results
    recs = {r.statement: r for r in statement_records()
            if r.statement.startswith("SELECT node ")}
    assert recs["SELECT node big"].status == "CANCELLED_MEMORY_LIMIT"
    assert recs["SELECT node small"].status == "DONE"
    from griddb_spark.governor import statement_events

    ev = [e for e in statement_events()
          if e.request_id == recs["SELECT node big"].request_id
          and e.event_type == "STMT_STOP_MEMORY_LIMIT"]
    assert ev, "stop must be event-logged"
    if "scope=node" in ev[-1].detail:  # mid-run node selection
        assert "selection=largest" in ev[-1].detail
    # else: the statement out-raced the poll and failed the deterministic
    # post-action check — same outcome, per-statement event detail


def test_node_scope_lone_statement_breach(spark):
    """A single statement exceeding the whole node budget is itself a
    node breach (V5.7: the statement requiring memory beyond the limit
    is terminated)."""
    gov = MemoryGovernor(spark, total_memory_limit=64 * 1024,
                         node_scope=True)
    with pytest.raises(StatementMemoryLimitError):
        gov.run(lambda: _heavy(spark).collect(),
                statement="SELECT lone node breach")
    assert statement_records()[-1].status == "CANCELLED_MEMORY_LIMIT"


def test_node_scope_under_budget_both_complete(spark):
    """Concurrent statements whose joint working set stays under the
    node budget both complete — the shared budget only bites on the
    actual sum."""
    import threading

    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                         node_scope=True, resource_control_level=3)
    results: dict = {}

    def _run(tag):
        results[tag] = gov.run(lambda: _sized(spark, 1_000_000).count(),
                               statement=f"SELECT under {tag}")

    ts = [threading.Thread(target=_run, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == {"a": 10000, "b": 10000}


def test_node_scope_level2_victim_is_the_grower(spark):
    """Legacy level 2 under node scope maps V5.7 allocator semantics:
    the allocation that pushes past the limit fails — a steady-state
    statement polling after someone else's growth is never the victim.
    White-box check of the selection rule (no Spark jobs needed)."""
    from griddb_spark.governor import StatementRecord

    gov = MemoryGovernor(spark, total_memory_limit=100,
                         node_scope=True, resource_control_level=2)
    cancelled = []

    class _SC:
        def cancelJobGroup(self, gid):
            cancelled.append(gid)

    grower = StatementRecord("g1", "grower", 100, True, 0,
                             working_memory_bytes=90)
    steady = StatementRecord("g2", "steady", 100, True, 0,
                             working_memory_bytes=30)
    gov._running = {"g1": grower, "g2": steady}
    # steady polls first, did NOT grow: nobody dies on its poll
    assert gov._enforce_node(steady, _SC(), grew=False) is False
    assert steady.status == "RUNNING" and grower.status == "RUNNING"
    assert not cancelled
    # the grower's own poll takes the failure
    assert gov._enforce_node(grower, _SC(), grew=True) is True
    assert grower.status == "CANCELLED_MEMORY_LIMIT"
    assert steady.status == "RUNNING"
    assert cancelled == ["g1"]


def test_node_scope_level3_victim_is_largest(spark):
    """Level 3 stops the largest consumer regardless of who polls."""
    from griddb_spark.governor import StatementRecord

    gov = MemoryGovernor(spark, total_memory_limit=100,
                         node_scope=True, resource_control_level=3)
    cancelled = []

    class _SC:
        def cancelJobGroup(self, gid):
            cancelled.append(gid)

    big = StatementRecord("b", "big", 100, True, 0,
                          working_memory_bytes=90)
    small = StatementRecord("s", "small", 100, True, 0,
                            working_memory_bytes=30)
    gov._running = {"b": big, "s": small}
    # the SMALL statement's poll still selects the big one
    assert gov._enforce_node(small, _SC(), grew=True) is False
    assert big.status == "CANCELLED_MEMORY_LIMIT"
    assert small.status == "RUNNING"
    assert cancelled == ["b"]


def test_consolidated_poller_one_thread_for_many_statements(spark):
    """5.9 posture at realistic concurrency: ~50 concurrent governed
    statements (across TWO governor instances) are monitored by ONE
    consolidated poller thread per app — not one thread per statement —
    with unchanged semantics (all complete, all recorded DONE)."""
    import threading

    gov_a = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                           resource_control_level=3, poll_interval=0.02)
    gov_b = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                           resource_control_level=3, poll_interval=0.02)
    results: dict = {}
    peak_pollers: list[int] = []

    def _run(i):
        gov = gov_a if i % 2 == 0 else gov_b
        results[i] = gov.run(
            lambda: spark.range(0, 50_000).selectExpr(
                "id % 97 AS k", "id AS v").groupBy("k").count().count(),
            statement=f"SELECT poller {i}")
        peak_pollers.append(sum(
            1 for t in threading.enumerate()
            if t.name.startswith("griddb-governor-poller-")))

    ts = [threading.Thread(target=_run, args=(i,)) for i in range(50)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == {i: 97 for i in range(50)}
    assert peak_pollers and max(peak_pollers) <= 1
    recs = [r for r in statement_records()
            if r.statement.startswith("SELECT poller ")]
    assert len(recs) == 50 and all(r.status == "DONE" for r in recs)


def test_node_budget_shared_across_governor_instances(spark):
    """ADVICE r8: /sql/totalMemoryLimit is per NODE — two MemoryGovernor
    instances on one driver must charge the same allowance, not each get
    a full one. The running-statement registry is module-level (keyed by
    Spark app), so instance B's node enforcement sees instance A's
    statements and can select them as victims."""
    from griddb_spark.governor import StatementRecord

    gov_a = MemoryGovernor(spark, total_memory_limit=100,
                           node_scope=True, resource_control_level=3)
    gov_b = MemoryGovernor(spark, total_memory_limit=100,
                           node_scope=True, resource_control_level=3)
    assert gov_a._running is gov_b._running  # one node, one registry
    cancelled = []

    class _SC:
        def cancelJobGroup(self, gid):
            cancelled.append(gid)

    big = StatementRecord("xgov-big", "big", 100, True, 0,
                          working_memory_bytes=80)
    small = StatementRecord("xgov-small", "small", 100, True, 0,
                            working_memory_bytes=40)
    gov_a._running["xgov-big"] = big          # "run" under instance A
    gov_b._running["xgov-small"] = small      # "run" under instance B
    try:
        # sum (120) breaches the shared 100 budget even though neither
        # instance's own statement does; B's poll selects A's statement
        # (the largest consumer) across the instance boundary
        assert gov_b._enforce_node(small, _SC(), grew=True) is False
        assert big.status == "CANCELLED_MEMORY_LIMIT"
        assert small.status == "RUNNING"
        assert cancelled == ["xgov-big"]
    finally:
        gov_a._running.pop("xgov-big", None)
        gov_a._running.pop("xgov-small", None)


def test_poller_emits_event_on_persistent_poll_failure(spark):
    """ADVICE r9: a PERSISTENT _poll_once failure (e.g. cancelJobGroup
    raising every tick) used to silently disable enforcement for that
    statement. The poller must surface it: a rate-limited
    STMT_MONITOR_ERROR event on the first consecutive failure (then
    every 50th), clearing on recovery."""
    import time as _time

    from griddb_spark.governor import (
        StatementRecord, _deregister_running, _register_running,
        statement_events)

    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                         poll_interval=0.01)

    def boom(group_id, rec):
        raise RuntimeError("py4j bridge down")

    gov._poll_once = boom
    rec = StatementRecord("xpoll-err", "SELECT poll error probe",
                          8 * 1024 ** 3, True, 0)
    _register_running(gov, "xpoll-err", rec)
    try:
        deadline = _time.time() + 5.0
        while _time.time() < deadline:
            errs = [e for e in statement_events()
                    if e.event_type == "STMT_MONITOR_ERROR"
                    and e.request_id == "xpoll-err"]
            if errs:
                break
            _time.sleep(0.02)
    finally:
        _deregister_running(gov, "xpoll-err")
    assert errs, "persistent poll failure emitted no observable event"
    assert "RuntimeError" in errs[0].detail
    assert "py4j bridge down" in errs[0].detail
    # rate-limited: first failure + every 50th — tens of failed ticks
    # must not flood the event stream with tens of events
    assert len(errs) <= 3
