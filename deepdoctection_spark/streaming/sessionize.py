"""Custom stateful streaming operator: session-gap conversation assembly.

`applyInPandasWithState` is the engine's escape hatch for stateful semantics
no built-in covers (SURVEY.md §2.8/§2.9): here, a conversation "session"
closes when no new turn arrives for `gap` of event time — the agent-
transcript analogue of web sessionization. The reference cannot express this
at all: its dataflow is stateless per-record pull iteration
(/root/reference/deepdoctection/dataflow/base.py:41-145) with no event time.

Semantics (event-time correct — output independent of micro-batch cuts):
- group by conv_id; state accumulates the conversation's pending turns;
- nothing is emitted while rows can still arrive: a session boundary is
  only decidable once the watermark passes last_ts + gap (any row admitted
  after that instant necessarily starts a later session). Cutting eagerly
  on an in-batch gap would finalize a session that a late-but-within-
  watermark row from the next batch could still bridge;
- at the event-time timeout the accumulated turns are sorted by event time,
  split at > gap holes, and ALL closed sessions are emitted; state clears —
  bounding state on an unbounded 10^12-turn stream;
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
            # The watermark passed max_ts + gap: no admissible future row
            # can extend ANY session currently in state (an admitted row has
            # event time ≥ watermark > max_ts + gap ⇒ it would start a new
            # session). Only NOW is splitting by gap safe — splitting
            # eagerly inside a batch would finalize a session that a
            # late-but-within-watermark row from a later batch could still
            # bridge, making output depend on micro-batch boundaries.
            if state.exists:
                idxs, texts, ts_us = (list(c) for c in state.get)
                order = sorted(range(len(ts_us)), key=lambda i: ts_us[i])
                start = 0
                for k in range(1, len(order)):
                    if ts_us[order[k]] > ts_us[order[k - 1]] + gap_us:
                        sel = order[start:k]
                        yield _emit(
                            conv_id,
                            [idxs[i] for i in sel],
                            [texts[i] for i in sel],
                            [ts_us[i] for i in sel],
                        )
                        start = k
                sel = order[start:]
                if sel:
                    yield _emit(
                        conv_id,
                        [idxs[i] for i in sel],
                        [texts[i] for i in sel],
                        [ts_us[i] for i in sel],
                    )
            state.remove()
            return

        # data batch: accumulate only; sessions are cut at timeout
        idxs: list[int] = []
        texts: list[str] = []
        ts_us: list[int] = []
        if state.exists:
            s = state.get
            idxs, texts, ts_us = list(s[0]), list(s[1]), list(s[2])
        max_ts = max(ts_us) if ts_us else 0
        for pdf in pdfs:
            idxs.extend(int(v) for v in pdf["turn_idx"].tolist())
            texts.extend(pdf["text"].tolist())
            batch_ts = [int(v) for v in pdf["ts_us"].tolist()]
            ts_us.extend(batch_ts)
            if batch_ts:
                max_ts = max(max_ts, max(batch_ts))
        if idxs:
            state.update((idxs, texts, ts_us))
            # fire once the watermark passes the LAST turn's gap horizon
            state.setTimeoutTimestamp(max_ts // 1000 + gap_us // 1000)
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
