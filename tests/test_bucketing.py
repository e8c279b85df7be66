"""Bucketed-layout tests: the conv_id aggregation over a bucketed table is
exchange-free and produces identical results to the shuffled path."""

from __future__ import annotations

from deepdoctection_spark.jobs.bucketing import (
    read_bucketed,
    reassemble_bucketed,
    write_bucketed,
)
from deepdoctection_spark.operators.extraction import extract_transcripts
from deepdoctection_spark.operators.reassembly import reassemble_conversations
from deepdoctection_spark.sources.transcripts import build_transcripts

TABLE = "extracted_bucketed_test"


def test_bucketed_reassembly_no_exchange_and_equal(spark, sf_small):
    ex = extract_transcripts(
        build_transcripts(spark, sf_small), with_words=False
    ).select("conv_id", "turn_idx", "extracted_text")

    write_bucketed(ex, TABLE, n_buckets=8)
    try:
        got = reassemble_bucketed(spark, TABLE)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # bucket layout satisfies the hash

        expected = reassemble_conversations(ex)
        fp = lambda df: sorted(
            (r["conv_id"], r["n_turns"], r["conv_text"]) for r in df.collect()
        )
        assert fp(got) == fp(expected)

        # the catalog records the bucket spec
        desc = spark.sql(f"DESCRIBE EXTENDED {TABLE}").collect()
        txt = "\n".join(f"{r[0]} {r[1]}" for r in desc)
        assert "Num Buckets 8" in txt and "conv_id" in txt, txt
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
