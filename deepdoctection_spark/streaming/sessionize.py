"""Custom stateful streaming operator: session-gap conversation assembly.

`applyInPandasWithState` is the engine's escape hatch for stateful semantics
no built-in covers (SURVEY.md §2.8/§2.9): here, a conversation "session"
closes when no new turn arrives for `gap` of event time — the agent-
transcript analogue of web sessionization. The reference cannot express this
at all: its dataflow is stateless per-record pull iteration
(/root/reference/deepdoctection/dataflow/base.py:41-145) with no event time.

Semantics:
- group by conv_id; state = the open session's turns + max event time seen;
- a turn extends the open session if ts <= last_ts + gap, else the open
  session is emitted and a new one starts;
- event-time timeout (watermark-driven) flushes idle sessions, bounding
  state on an unbounded 10^12-turn stream;
- emitted sessions order turns by the explicit (turn_idx) key — arrival
  order never matters (the engine's stable-ordering contract).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("conv_text", T.StringType()),
    ]
)

# state: parallel arrays of turn keys/texts/ts (micros) for the OPEN session
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType())),
        T.StructField("texts", T.ArrayType(T.StringType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
    ]
)


def _emit(conv_id: str, idxs: list, texts: list, ts_us: list) -> pd.DataFrame:
    order = sorted(range(len(idxs)), key=lambda i: idxs[i])
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "session_start_us": [min(ts_us)],
            "session_end_us": [max(ts_us)],
            "n_turns": [len(idxs)],
            "conv_text": ["\n\n".join(texts[i] for i in order)],
        }
    )


def _sessionizer(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                idxs, texts, ts_us = state.get
                yield _emit(conv_id, list(idxs), list(texts), list(ts_us))
            state.remove()
            return

        idxs: list[int] = []
        texts: list[str] = []
        ts_us: list[int] = []
        if state.exists:
            s = state.get
            idxs, texts, ts_us = list(s[0]), list(s[1]), list(s[2])

        rows: list[tuple[int, str, int]] = []
        for pdf in pdfs:
            for ti, tx, tus in zip(
                pdf["turn_idx"].tolist(),
                pdf["text"].tolist(),
                pdf["ts_us"].tolist(),
            ):
                rows.append((int(ti), tx, int(tus)))
        rows.sort(key=lambda r: r[2])  # event-time order for gap detection

        # track the open session's latest event time incrementally: state
        # rows were appended in ascending order and this batch is sorted, so
        # max == last seen; recomputing max() per row would be O(n²) for a
        # hot conversation with a long-lived session
        last_ts = max(ts_us) if ts_us else None
        for ti, tx, tus in rows:
            if last_ts is not None and tus > last_ts + gap_us:
                yield _emit(conv_id, idxs, texts, ts_us)
                idxs, texts, ts_us = [], [], []
            idxs.append(ti)
            texts.append(tx)
            ts_us.append(tus)
            if last_ts is None or tus > last_ts:
                last_ts = tus

        if idxs:
            state.update((idxs, texts, ts_us))
            # flush when the watermark passes the session's gap horizon
            state.setTimeoutTimestamp(last_ts // 1000 + gap_us // 1000)
        else:
            state.remove()

    return fn


def sessionize_conversations(
    extracted: DataFrame,
    gap_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """extracted (streaming, with ts + extracted_text) → closed sessions.

    Input is the stream_extract output; one shuffle on conv_id feeds the
    stateful operator, mirroring the batch reassembly topology.
    """
    from pyspark.sql import functions as F

    src = extracted.select(
        "conv_id",
        "turn_idx",
        F.col("extracted_text").alias("text"),
        F.unix_micros("ts").alias("ts_us"),
        "ts",
    ).withWatermark("ts", watermark)
    return src.groupBy("conv_id").applyInPandasWithState(
        _sessionizer(gap_seconds * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
