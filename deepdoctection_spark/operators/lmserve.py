"""Model-serving UDF pattern: LM token / sequence classification services.

The reference's LMTokenClassifierService / LMSequenceClassifierService
(/root/reference/deepdoctection/pipe/lm.py:36-340) run a LayoutLM-family
model over the words / full text of each page. No model weights or torch
ship in this container, so the MODEL is a deterministic stub (md5-derived
logits); everything around it is the real serving pattern a 1000-executor
deployment needs:

- **executor-local lazy init**: the "model" is constructed once per Python
  worker via a module global (the reference clones components per thread,
  pipe/concurrency.py:118-124; on Spark the worker process is the clone
  scope), not per batch and never on the driver;
- **Arrow batching**: one `mapInPandas` stage; the model sees token lists
  per batch (the `accepts_batch` contract, extern/base.py:228-233);
- **declared output schema** per service (get_meta_annotation analogue).

Because the stub logits are md5-derived, a DuckDB oracle reproduces every
label exactly — the serving plumbing is correctness-gated even though the
model is fake. Swapping in a real model changes only `_StubModel.predict`.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import md5

import pandas as pd
from pyspark.sql import DataFrame

TOKEN_TAGS = ["O", "B-HEAD", "I-HEAD", "B-CELL", "I-CELL"]
SEQ_LABELS = ["report", "conversation", "table_doc", "mixed"]

_MODELS: dict[str, "_StubModel"] = {}  # executor-local, one per service kind


class _StubModel:
    """Deterministic stand-in for a LayoutLM checkpoint: 'logit' of token t
    for class k = byte k of md5(prefix|t); prediction = argmax (first max
    wins, matching SQL's greatest/CASE tie-break)."""

    def __init__(self, kind: str):
        self.kind = kind

    def predict_tokens(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            h = md5(f"tok|{t}".encode()).digest()
            scores = h[: len(TOKEN_TAGS)]
            out.append(TOKEN_TAGS[max(range(len(scores)), key=lambda i: (scores[i], -i))])
        return out

    def predict_sequence(self, text: str) -> str:
        h = md5(f"seq|{text}".encode()).digest()
        scores = h[: len(SEQ_LABELS)]
        return SEQ_LABELS[max(range(len(scores)), key=lambda i: (scores[i], -i))]


def _get_model(kind: str) -> _StubModel:
    # keyed by kind: a worker running BOTH services must not reload weights
    # on every alternating task (a single invalidated slot would)
    model = _MODELS.get(kind)
    if model is None:
        model = _MODELS[kind] = _StubModel(kind)  # real: load weights once
    return model


TOKEN_TAG_SCHEMA = (
    "conv_id string, turn_idx int, word_idx int, token string, token_tag string"
)


def lm_token_tags(word_rows: DataFrame) -> DataFrame:
    """word_tokens rows → per-word token tags (LMTokenClassifierService +
    Page.get_token(), view.py:984-994)."""

    def serve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model("token")  # once per worker, reused across batches
        for pdf in batches:
            tags = model.predict_tokens(pdf["token"].tolist())
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].tolist(),
                    "turn_idx": pd.array(pdf["turn_idx"].tolist(), dtype="int32"),
                    "word_idx": pd.array(pdf["word_idx"].tolist(), dtype="int32"),
                    "token": pdf["token"].tolist(),
                    "token_tag": tags,
                }
            )

    return word_rows.select("conv_id", "turn_idx", "word_idx", "token").mapInPandas(
        serve, schema=TOKEN_TAG_SCHEMA
    )


SEQ_CLS_SCHEMA = "conv_id string, turn_idx int, doc_label string"


def lm_sequence_labels(extracted: DataFrame) -> DataFrame:
    """per-turn extracted_text → document-class label
    (LMSequenceClassifierService)."""

    def serve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model("seq")
        for pdf in batches:
            labels = [
                model.predict_sequence(t) for t in pdf["extracted_text"].tolist()
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].tolist(),
                    "turn_idx": pd.array(pdf["turn_idx"].tolist(), dtype="int32"),
                    "doc_label": labels,
                }
            )

    return extracted.select("conv_id", "turn_idx", "extracted_text").mapInPandas(
        serve, schema=SEQ_CLS_SCHEMA
    )
