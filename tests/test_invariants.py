"""Engine invariants (SURVEY.md §5): deterministic results under any physical
parallelism, salted-vs-unsalted equivalence, and plan-shape guarantees
(pushdown / broadcast / narrow extraction) asserted on the optimized plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.config import PipelineConfig
from deepdoctection_spark.operators.extraction import extract_transcripts
from deepdoctection_spark.operators.reassembly import (
    reassemble_conversations,
    salted_repartition,
)
from deepdoctection_spark.sources.transcripts import build_transcripts


def _conv_fp(df):
    """Deterministic fingerprint of reassembled conversations."""
    return sorted(
        (r["conv_id"], r["n_turns"], r["conv_text"])
        for r in df.collect()
    )


def test_reassembly_stable_under_repartition(spark, sf_small):
    t = build_transcripts(spark, sf_small)
    base = _conv_fp(reassemble_conversations(extract_transcripts(t, with_words=False)))
    for k in (1, 5, 17):
        shuffled = t.repartition(k)
        got = _conv_fp(
            reassemble_conversations(extract_transcripts(shuffled, with_words=False))
        )
        assert got == base, f"result changed under repartition({k})"


def test_salted_equals_unsalted(spark, sf_small):
    t = build_transcripts(spark, sf_small)
    base = _conv_fp(reassemble_conversations(extract_transcripts(t, with_words=False)))
    salted = salted_repartition(t, 16, PipelineConfig(skew_salt_buckets=4))
    got = _conv_fp(
        reassemble_conversations(extract_transcripts(salted, with_words=False))
    )
    assert got == base


def test_extraction_stage_is_narrow(spark, sf_small):
    """No shuffle between the scan and the Arrow stage: the physical plan of
    the extraction must contain no Exchange below the mapInArrow node."""
    t = build_transcripts(spark, sf_small)  # no repartition requested
    plan = (
        extract_transcripts(t, with_words=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_scan_prunes_columns(spark, sf_small):
    """Selecting only ids from the extraction must not read the payload
    template columns beyond what synthesis needs, and the documents scan
    must not read unreferenced columns (Catalyst column pruning reaches the
    parquet ReadSchema)."""
    docs_cols_needed = {"doc_id", "text", "lang", "source"}
    t = build_transcripts(spark, sf_small)
    plan = (
        t.select("conv_id", "turn_idx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # conv_id/turn_idx derive from doc_id only -> ReadSchema must shrink
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan
    full_plan = t._jdf.queryExecution().executedPlan().toString()
    for c in docs_cols_needed:
        assert c in full_plan


def test_small_dim_join_broadcasts(spark, sf_parity):
    """rel_join_revenue joins lineitem against small dims — the optimized
    plan must pick BroadcastHashJoin, not sort-merge, for the dim side."""
    import deepdoctection_spark.plans.relational  # noqa: F401
    from deepdoctection_spark.plans.registry import QUERIES

    plan = (
        QUERIES["rel_join_revenue"](spark, sf_parity)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_filter_pushdown_reaches_scan(spark, sf_parity):
    df = spark.read.parquet(f"{sf_parity}/lineitem.parquet").where(
        F.col("l_quantity") > 45
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan, plan


def test_mega_conversation_skew_path(spark, sf_small):
    """A single conv holding ~30% of all turns: extraction + reassembly stay
    correct, salted == unsalted, and the mega conversation's text is ordered
    by turn_idx."""
    from deepdoctection_spark.sources.transcripts import build_skewed_transcripts

    t = build_skewed_transcripts(spark, sf_small)
    n_total = t.count()
    n_mega = t.where(F.col("conv_id") == "conv-mega").count()
    assert abs(n_mega / n_total - 0.3) < 0.05

    base = _conv_fp(reassemble_conversations(extract_transcripts(t, with_words=False)))
    salted = salted_repartition(t, 16, PipelineConfig(skew_salt_buckets=8))
    got = _conv_fp(
        reassemble_conversations(extract_transcripts(salted, with_words=False))
    )
    assert got == base

    mega = [r for r in base if r[0] == "conv-mega"]
    assert len(mega) == 1 and mega[0][1] == n_mega
    # ordered by turn_idx: first chunk of conv_text = extraction of min turn
    first_turn = (
        extract_transcripts(
            t.where(F.col("conv_id") == "conv-mega"), with_words=False
        )
        .orderBy("turn_idx")
        .limit(1)
        .collect()[0]["extracted_text"]
    )
    assert mega[0][2].startswith(first_turn)


def test_poison_row_quarantined_not_fatal(spark):
    """Row-level error quarantine (the MappingContextManager contract,
    SURVEY §2.9): a poison row yields an `error` value and empty outputs;
    the batch and the job survive."""
    rows = [
        ("c1", 0, "user", "good text", "", None),
        ("c1", None, "user", "poison: null turn_idx", "", None),  # int(None) raises
        ("c1", 2, "user", "<p>also good</p>", "browser", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = extract_transcripts(df, with_words=True).collect()
    assert len(out) == 3
    by_text = {r["text"] if "text" in r else None: r for r in out}
    errs = [r for r in out if r["error"] is not None]
    good = [r for r in out if r["error"] is None]
    assert len(errs) == 1 and len(good) == 2
    assert errs[0]["extracted_text"] == "" and errs[0]["blocks"] == []
    assert {g["extracted_text"] for g in good} == {"good text", "also good"}


def test_empty_doc_counts_zero_tokens(spark):
    """split('', ' ') returns [''] — the operators must filter it so empty
    docs count 0 tokens, matching kernels.textnorm.whitespace_token_count."""
    from deepdoctection_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["ws_tokens"] for r in textstats.token_counts(docs).collect()}
    assert got == {1: 2, 2: 0, 3: 0}


def test_vertical_tab_normalizes_identically_in_both_engines(spark):
    """Java's \\s includes \\x0B, RE2's (DuckDB) does not — the engine pins an
    explicit whitespace class so _NORM-derived oracles can't diverge on
    real-world text containing vertical tabs."""
    import duckdb

    from deepdoctection_spark.operators import textstats

    weird = "a\x0bb  c\td"
    docs = spark.createDataFrame([(1, weird)], "doc_id long, text string")
    got = textstats.token_counts(docs).collect()[0]
    oracle = duckdb.sql(
        "SELECT len(list_filter(string_split("
        "trim(regexp_replace('a' || chr(11) || 'b  c' || chr(9) || 'd',"
        " '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')), ' '), w -> length(w) > 0)) AS n"
    ).fetchone()[0]
    assert got["ws_tokens"] == oracle == 4  # a b c d


def test_two_phase_reassembly_equals_single_phase_on_skew(spark, sf_small):
    """The mega-conversation memory bound: the chunked two-phase plan must be
    byte-identical to the single-phase plan, with a chunk size small enough
    that the mega conversation spans MANY phase-1 groups."""
    from deepdoctection_spark.sources.transcripts import build_skewed_transcripts

    t = build_skewed_transcripts(spark, sf_small)
    ex = extract_transcripts(t, with_words=False)
    single = _conv_fp(reassemble_conversations(ex, chunk_size=None))
    two_phase = _conv_fp(reassemble_conversations(ex, chunk_size=7))
    assert two_phase == single


def test_chunked_reassembly_reconstructs_full_text(spark, sf_small):
    """Bounded-output contract: concatenating chunk_text over ascending
    chunk_no restores exactly the one-row conv_text, and every chunk holds
    at most chunk_size turns."""
    from collections import defaultdict

    from deepdoctection_spark.operators.reassembly import (
        reassemble_conversations_chunked,
    )
    from deepdoctection_spark.sources.transcripts import build_skewed_transcripts

    t = build_skewed_transcripts(spark, sf_small)
    ex = extract_transcripts(t, with_words=False)
    full = {r["conv_id"]: (r["n_turns"], r["conv_text"])
            for r in reassemble_conversations(ex, chunk_size=None).collect()}
    chunks = defaultdict(list)
    for r in reassemble_conversations_chunked(ex, chunk_size=5).collect():
        assert r["chunk_turns"] <= 5
        chunks[r["conv_id"]].append((r["chunk_no"], r["chunk_turns"], r["chunk_text"]))
    assert set(chunks) == set(full)
    for conv, parts in chunks.items():
        parts.sort()
        n = sum(p[1] for p in parts)
        text = "\n\n".join(p[2] for p in parts)
        assert (n, text) == full[conv]


def test_round2_operators_are_narrow(spark, sf_small):
    """matchnms / refinement / pubtables / csv stages: zero Exchange — spans
    never cross a turn, so each query must stay scan → project → mapInArrow."""
    from deepdoctection_spark.operators.matchnms import (
        noisy_assignments,
        noisy_candidates,
    )
    from deepdoctection_spark.operators.pubtablesop import pubtables_grids
    from deepdoctection_spark.operators.refineop import (
        refined_csv_rows,
        refined_tables,
    )

    t = build_transcripts(spark, sf_small)
    ex = extract_transcripts(t, with_words=False)
    for name, df in [
        ("noisy_candidates", noisy_candidates(ex)),
        ("noisy_assignments", noisy_assignments(ex)),
        ("refined_tables", refined_tables(ex)),
        ("refined_csv_rows", refined_csv_rows(ex)),
        ("pubtables_grids", pubtables_grids(t)),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} plan has a shuffle:\n{plan}"


def test_simhash_pairs_plan_has_no_cross_join(spark, sf_parity):
    """The pigeonhole-banded rewrite must plan as an equi-join: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    from deepdoctection_spark.operators.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_parity}/documents.parquet")
    plan = (
        simhash_near_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_row_guard_counter_counts_drops(spark):
    """Quarantine observability: dropped rows are counted on the accumulator
    (log-and-COUNT, the reference's maputils contract), visible driver-side."""
    from deepdoctection_spark.operators.pubtablesop import pubtables_grids
    from deepdoctection_spark.operators.quarantine import quarantine_counter

    rows = [("c1", 0, ""), ("c1", None, ""), ("c2", None, ""), ("c2", 3, "")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    counter = quarantine_counter(spark)
    out = pubtables_grids(df, counter=counter).collect()
    assert len(out) == 2  # poison rows dropped
    assert counter.value == 2  # ...and counted


def test_extraction_over_icetable_is_narrow(spark, sf_small, tmp_path):
    """The north-rule input shape: extraction over an Iceberg-semantics
    snapshot read must stay shuffle-free too — the multi-file manifest read
    is still one parquet scan feeding mapInArrow with no Exchange, so the
    table layer costs nothing in plan shape."""
    from deepdoctection_spark.sources.icetable import IceTable
    from pyspark.sql import functions as F

    tr = build_transcripts(spark, sf_small)
    t = IceTable(str(tmp_path / "tbl"))
    for k in range(3):
        t.append(tr.where(F.pmod(F.xxhash64("conv_id"), F.lit(3)) == k))
    plan = (
        extract_transcripts(t.read(spark), with_words=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
