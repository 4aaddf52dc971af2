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
        n, ema = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            out = []
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                if v is None or v != v:
                    continue
                anomalous = n >= min_history and v > threshold * ema
                ema = v if n == 0 else alpha * v + (1 - alpha) * ema
                n += 1
                out.append((*key, ts, float(v), float(ema), bool(anomalous)))
            if out:
                yield pd.DataFrame(out, columns=[*keys, ts_col, "value", "ema",
                                                 "is_anomaly"])
        state.update((n, ema))

    return stream.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
