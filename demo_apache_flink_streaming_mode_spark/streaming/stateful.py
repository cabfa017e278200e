"""True keyed-state streaming operators (SURVEY.md §2.7, ST1/ST2).

The reference implements these with RichMapFunction + ValueState
(``chapter5/StatefulOperations.java:83-143``,
``chapter6_exercise/AnalyzeBrowserEvents.java:115-181``). The Spark
extension point for arbitrary keyed state is
``groupBy(key).applyInPandasWithState`` — Arrow-batched per-key state
functions, the sanctioned equivalent of Flink's keyed process function.

Semantics parity with the batch twins (``operators.stateful``): state
transitions follow (ts, tiebreak) order. Spark does not order rows
within a micro-batch, so the handler sorts each key's batch — correct
whenever a key's events arrive in-order ACROSS micro-batches (the
reference makes the same in-order assumption: Flink keyed streams
preserve per-key arrival order, and its generators emit in order).

Scale: state is one small tuple per key in the state store (RocksDB
provider for large key spaces); Arrow transfer is batched per
micro-batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_MS = 1_000_000  # ns -> ms divisor


def _to_ms(col: pd.Series) -> pd.Series:
    return col.astype("int64") // _MS


def _sql_type(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()


def repeat_action_alert(df: DataFrame, key: str, ts: str, action_col: str,
                        action: str, threshold_ms: int,
                        tiebreak: str = "event_id") -> DataFrame:
    """ST1 streaming — same outputs as ``operators.stateful.repeat_action_alert``.

    State: last `action` timestamp per key (one long).
    """

    def handle(key_tuple: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        last_ms = state.get[0] if state.exists else None
        out_ids, out_diffs = [], []
        for pdf in pdfs:
            pdf = pdf[pdf[action_col] == action]
            if pdf.empty:
                continue
            pdf = pdf.sort_values([ts, tiebreak])
            ms = _to_ms(pdf[ts])
            for eid, m in zip(pdf[tiebreak], ms):
                if last_ms is not None and m - last_ms < threshold_ms:
                    out_ids.append(eid)
                    out_diffs.append(m - last_ms)
                last_ms = int(m)
        if last_ms is not None:
            state.update((last_ms,))
        if out_ids:
            yield pd.DataFrame({key: key_tuple[0], "event_id": out_ids,
                                "time_diff_ms": out_diffs})

    out_schema = (f"{key} {_sql_type(df, key)}, "
                  f"event_id {_sql_type(df, tiebreak)}, time_diff_ms long")
    return df.groupBy(key).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType="last_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)


def action_durations(df: DataFrame, key: str, ts: str, action_col: str,
                     start_action: str, end_action: str,
                     tiebreak: str = "event_id") -> DataFrame:
    """ST2 streaming — same outputs as ``operators.stateful.action_durations``.

    State: (last_action, last_ms) per key; `end_action` clears it
    (session end), every other event overwrites it.
    """

    def handle(key_tuple: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        prev_a, prev_ms = state.get if state.exists else (None, None)
        rows: list[tuple] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([ts, tiebreak])
            ms = _to_ms(pdf[ts])
            for eid, act, m in zip(pdf[tiebreak], pdf[action_col], ms):
                empty = prev_a is None
                no_dur = empty or act == start_action
                rows.append((key_tuple[0], eid,
                             "None" if no_dur else prev_a,
                             0 if no_dur else int(m) - prev_ms))
                if act == end_action:
                    prev_a, prev_ms = None, None
                else:
                    prev_a, prev_ms = act, int(m)
        if prev_a is None:
            state.remove()
        else:
            state.update((prev_a, prev_ms))
        if rows:
            yield pd.DataFrame(rows, columns=[key, "event_id",
                                              "prev_action", "duration_ms"])

    out_schema = (f"{key} {_sql_type(df, key)}, "
                  f"event_id {_sql_type(df, tiebreak)}, "
                  "prev_action string, duration_ms long")
    return df.groupBy(key).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType="last_action string, last_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
