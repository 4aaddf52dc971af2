"""Custom stateful streaming operators (``applyInPandasWithState``).

GridDB deployments poll a TimeSeries and alert on anomalies client-side
(no server triggers since v5 — ``docs/GridDB-5.0-CE-RELEASE_NOTES.md``);
with Structured Streaming the pattern becomes a stateful operator inside
the engine. ``ema_anomaly_stream`` keeps one (count, EMA) state per key and
flags rows that deviate from their key's running level — the template for
any per-key running-state operator (counters, sessionization, online
z-score): swap the state tuple and the per-batch update rule.

Scale: state is per-key and constant-size; Spark shuffles rows to their
key's state partition and snapshots state to the checkpoint — no unbounded
growth, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "n LONG, ema DOUBLE"


def ema_anomaly_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.2,
    threshold: float = 2.0,
    min_history: int = 5,
) -> DataFrame:
    """Flag rows whose value exceeds ``threshold ×`` their key's running
    EMA (after ``min_history`` observations). Returns a stream of
    (keys..., ts, value, ema, is_anomaly).
    """
    import pandas as pd

    keys = list(key_cols)
    out_schema = T.StructType(
        [stream.schema[k] for k in keys]
        + [
            stream.schema[ts_col],
            T.StructField("value", T.DoubleType(), True),
            T.StructField("ema", T.DoubleType(), True),
            T.StructField("is_anomaly", T.BooleanType(), True),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        n, ema = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            vals = pdf[value_col].astype("float64")
            keep = vals.notna().to_numpy()
            v = vals.to_numpy()[keep]
            if len(v) == 0:
                continue
            # the EMA recurrence vectorized: pandas ewm(adjust=False) is
            # bit-identical to the per-row `alpha*v + (1-alpha)*ema` loop
            # (verified), with the carried state injected as a seed row.
            if n == 0:
                ema_seq = (
                    pd.Series(v).ewm(alpha=alpha, adjust=False).mean()
                    .to_numpy()
                )
                prev = np.concatenate(([0.0], ema_seq[:-1]))
            else:
                seeded = (
                    pd.Series(np.concatenate(([ema], v)))
                    .ewm(alpha=alpha, adjust=False).mean().to_numpy()
                )
                ema_seq = seeded[1:]
                prev = np.concatenate(([ema], ema_seq[:-1]))
            counts = n + np.arange(len(v))  # observations before each row
            anomalies = (counts >= min_history) & (v > threshold * prev)
            out = {k: np.full(len(v), kv) for k, kv in zip(keys, key)}
            out[ts_col] = pdf[ts_col].to_numpy()[keep]
            out["value"] = v
            out["ema"] = ema_seq
            out["is_anomaly"] = anomalies
            n += len(v)
            ema = float(ema_seq[-1])
            yield pd.DataFrame(out)
        state.update((n, ema))

    return stream.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def match_recognize_stream(
    stream: DataFrame,
    pattern: str,
    define: "dict[str, str]",
    measures: "dict[str, str] | None" = None,
    partition_by: Sequence[str] = ("user_id",),
    order_by: str = "ts",
    measure_types: "dict[str, str] | None" = None,
    all_rows: bool = False,
    max_pending: int = 10_000,
    context_rows: int = 1,
) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: continuous pattern detection per key
    (the streaming face of OP_WINDOW_MATCH — Flink's MATCH_RECOGNIZE /
    CEP shape, absent from the reference which only matches at query
    time).

    Per key, state carries (a) the global match counter and (b) the
    PENDING TAIL — rows after the last completed match, which may still
    join a match once later rows arrive — plus ``context_rows`` extra
    rows that feed physical PREV() across the batch boundary but can
    never re-match. Each micro-batch replays pending + new rows through
    the same compiled NFA as the batch operator (``compile_matcher``), so
    a single-batch run is row-identical to batch MATCH_RECOGNIZE and
    matches spanning micro-batch boundaries complete exactly once.

    State is bounded by ``max_pending`` rows per key (the streaming
    analog of CONF_PATTERN_MATCH_MEMORY_LIMIT — a pattern that stays
    open longer than the tail is dropped oldest-first). Rows are assumed
    to arrive in event-time order per key across batches (file replay /
    ordered sources); out-of-order arrival needs an upstream watermark
    sort, which this operator deliberately leaves to ingest.
    """
    import pickle

    import pandas as pd

    from griddb_spark.operators.match_recognize import compile_matcher

    keys = list(partition_by)
    process, out_schema, out_names = compile_matcher(
        stream.schema, pattern, define, measures, keys, order_by,
        all_rows, measure_types,
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            offset, saved_ctx, blob = state.get
            pending = pickle.loads(bytes(blob)) if blob else None
        else:
            offset, saved_ctx, pending = 0, 0, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        if pending is not None and len(pending):
            # pending rows are matchable; only the leading context block
            # (oldest rows — they sort first by construction) is not.
            # n_ctx rides in the state tuple explicitly: pandas
            # DataFrame.attrs' pickle round-trip is an implementation
            # detail that an upgrade could silently drop, which would let
            # consumed context rows re-match across micro-batches.
            n_ctx = int(saved_ctx)
            rows = pd.concat([pending, batch], ignore_index=True)
        else:
            n_ctx, rows = 0, batch
        out_rows, consumed, sorted_pdf = process(rows, offset, n_ctx)
        if isinstance(out_rows, pd.DataFrame):  # vectorized single-var path
            n_matches = (
                int(out_rows["match_no"].iloc[-1]) - offset
                if len(out_rows)
                else 0
            )
        else:
            n_matches = out_rows[-1]["match_no"] - offset if out_rows else 0
        # new pending = context tail + unconsumed rows, bounded
        tail_start = max(consumed - context_rows, 0)
        tail = sorted_pdf.iloc[tail_start:]
        if len(tail) > max_pending + context_rows:
            tail = tail.iloc[-(max_pending + context_rows):]
            tail_ctx = context_rows
        else:
            tail_ctx = consumed - tail_start
        tail = tail.reset_index(drop=True)
        state.update((offset + n_matches, int(tail_ctx), pickle.dumps(tail)))
        if isinstance(out_rows, pd.DataFrame):
            if len(out_rows):
                yield out_rows
        elif out_rows:
            yield pd.DataFrame(out_rows, columns=out_names)

    return stream.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="match_no LONG, n_ctx INT, pending BINARY",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
