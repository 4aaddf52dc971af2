"""perfstages: zero-overhead-off stage attribution used by bench.py to
localize embedding-family variance (VERDICT r9 #5)."""

from __future__ import annotations

import time

from griddb_spark.perfstages import collecting, stage


def test_noop_when_not_collecting():
    # no accumulator active: stage() must yield straight through
    with stage("anything"):
        x = 1
    assert x == 1


def test_stages_accumulate_and_sum_additively():
    with collecting() as acc:
        with stage("a"):
            time.sleep(0.03)
        with stage("b"):
            time.sleep(0.01)
        with stage("a"):  # same label accrues
            time.sleep(0.02)
    assert set(acc) == {"a", "b"}
    assert acc["a"] >= 0.045 and acc["b"] >= 0.008


def test_nested_stage_pauses_outer_so_walls_are_disjoint():
    with collecting() as acc:
        t0 = time.perf_counter()
        with stage("outer"):
            time.sleep(0.02)
            with stage("inner"):
                time.sleep(0.03)
            time.sleep(0.01)
        wall = time.perf_counter() - t0
    # inner time is attributed ONLY to inner; outer holds the rest —
    # the per-stage walls sum to the measured block (additive contract)
    assert acc["inner"] >= 0.028
    assert acc["outer"] >= 0.028 and acc["outer"] < acc["inner"] + 0.04
    assert abs((acc["inner"] + acc["outer"]) - wall) < 0.02


def test_collecting_restores_previous_state():
    with collecting() as outer_acc:
        with stage("x"):
            with collecting() as inner_acc:
                with stage("y"):
                    time.sleep(0.01)
            time.sleep(0.01)
    assert "y" in inner_acc and "y" not in outer_acc
    assert "x" in outer_acc


def test_concurrent_thread_stacks_do_not_interleave():
    """foreachBatch stages run on the streaming microbatch thread while
    the bench main thread may hold its own open stage — each thread's
    nesting must pause/resume only its own stack (a shared stack
    corrupted attribution or IndexError'd on pop; ADVICE r10)."""
    import threading

    with collecting() as acc:
        barrier = threading.Barrier(2)
        errs: list = []

        def worker():
            try:
                barrier.wait()
                for _ in range(50):
                    with stage("w_outer"):
                        with stage("w_inner"):
                            time.sleep(0.0005)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        t = threading.Thread(target=worker)
        t.start()
        barrier.wait()
        for _ in range(50):
            with stage("m_outer"):
                with stage("m_inner"):
                    time.sleep(0.0005)
        t.join()

    assert not errs
    assert set(acc) == {"w_outer", "w_inner", "m_outer", "m_inner"}
    for k in acc:
        assert acc[k] >= 0.0


def test_registered_metric_deltas_land_as_overlays():
    """register_metric readers are snapshotted at collecting() entry and
    their positive deltas land as '@' overlay entries at exit — the
    bridge that lets executor-side task kernels (multimodal codecs)
    attribute time the driver never brackets."""
    import griddb_spark.perfstages as PS

    counter = {"v": 10.0}
    PS.register_metric("@probe_metric", lambda: counter["v"])
    try:
        with collecting() as acc:
            counter["v"] += 2.5
        assert abs(acc["@probe_metric"] - 2.5) < 1e-9
        with collecting() as acc2:
            pass  # no growth -> no entry
        assert "@probe_metric" not in acc2
        import pytest

        with pytest.raises(ValueError):
            PS.register_metric("no_at_prefix", lambda: 0.0)
    finally:
        PS._METRICS.pop("@probe_metric", None)


def test_multimodal_codec_kernels_report_task_seconds(spark):
    """Forcing the PNG encode+decode pipeline under collecting() yields
    @png_encode/@png_decode overlays (VERDICT r12 item 5: the multimodal
    gates' codec phases are now attributable in bench stage maps)."""
    from griddb_spark.pipeline.multimodal import decode_features, png_pack

    docs = spark.createDataFrame(
        [(i, "x" * 96) for i in range(8)], "doc_id long, text string")
    with collecting() as acc:
        feats = decode_features(
            png_pack(docs, "text", width=32), "media", "doc_id",
            fake=False)
        feats.write.mode("overwrite").format("noop").save()
    assert acc.get("@png_encode", 0.0) > 0.0
    assert acc.get("@png_decode", 0.0) > 0.0
