"""Sessionization — gap-based user sessions over the event stream.

North-star stateful-streaming operator (no reference analog). Two
implementations with identical semantics:

- ``sessionize_batch``: window functions — a new session starts when the
  gap to the previous event of the same user exceeds ``gap``; session id
  is the running count of session starts. Fully SQL-expressible, so it
  is oracle-checkable.
- ``sessionize_stream``: ``applyInPandasWithState`` keeps (last_ts,
  session_no, aggregates) per user with a processing-time timeout — the
  custom-stateful-operator shape Structured Streaming provides for
  semantics that windowed aggs can't express.

Scale: both shuffle once on user_id. The streaming state is O(users);
use RocksDB state store + watermark-based eviction in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rows: (user_id, session_no, session_start, session_end,
    n_events). session_no is 1-based per user in time order."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000  # microsecond-exact gaps
    with_gap = events.select(
        user_col,
        ts_col,
        (
            F.unix_micros(F.col(ts_col))
            - F.lag(F.unix_micros(F.col(ts_col))).over(w)
        ).alias("__gap"),
    ).withColumn(
        "__new_session",
        (F.col("__gap").isNull() | (F.col("__gap") > gap_us)).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_no",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy(user_col, "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful streaming sessionizer. Emits one row per CLOSED
    session (a later event arrived beyond the gap, or state timed out).

    State per user: [last_ts_epoch, session_no, session_start_epoch,
    n_events]. Events inside a micro-batch are sorted by time; late rows
    older than the current session's last event extend counts only.

    availableNow caveat (r16): a drain of a PROCESSING-time-timeout
    stateful query never self-terminates — after the data batches Spark
    loops empty "cleaning up state" batches waiting for wall-clock
    timeouts. Continuous-trigger production deployments are unaffected;
    drain-style callers must stop the query once a zero-input batch has
    run (every session closable by DATA has been emitted by then).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_us = gap_minutes * 60 * 1_000_000  # state keeps integer micros

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_no", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = "last_us long, session_no long, start_us long, n long"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                last_us, sno, start_us, n = state.get
                closed.append((user, sno, start_us, last_us, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts = sorted(int(t.value) // 1000 for t in rows[ts_col])
            if state.exists:
                last_us, sno, start_us, n = state.get
            else:
                last_us, sno, start_us, n = None, 0, None, 0
            for t in ts:
                if last_us is None or (t - last_us) > gap_us:
                    if last_us is not None:
                        closed.append((user, sno, start_us, last_us, n))
                    sno += 1
                    start_us, n = t, 0
                n += 1
                last_us = max(last_us, t) if last_us is not None else t
            state.update((last_us, sno, start_us, n))
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_no": [c[1] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[3] for c in closed], unit="us"
                    ),
                    "n_events": [c[4] for c in closed],
                }
            )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
