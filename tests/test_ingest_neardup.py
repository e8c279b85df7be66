"""Streaming near-dup ingest (streaming/ingest_neardup.py): exactly-once
three-table commits, snapshot-isolated verdict recomputation on redelivery,
and batch-replay parity. The end-to-end streaming differential is the
stream_neardup_ingest oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.dedup import incremental_minhash_dedup
from deepdoctection_spark.streaming.ingest_neardup import NearDupIngest

_BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to find some food for its hungry children"
)
_OTHER = (
    "spark plans shuffle partitions skew salting broadcast hints adaptive "
    "execution codegen stages tasks executors drivers memory spill metrics"
)
_THIRD = (
    "violet paper lanterns drift over the harbor while accordion players "
    "tune slow waltzes and fishermen mend nets beside sleeping grey cats"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _verdicts(ing, spark):
    return {
        r["doc_id"]: (r["dup_of"], r["is_new"], r["epoch"])
        for r in ing.verdicts.read(spark).collect()
    }


def test_three_epoch_ingest_accepts_only_new(spark, tmp_path):
    ing = NearDupIngest(str(tmp_path / "t"), threshold=0.5)
    # epoch 0: two distinct docs — both accepted
    ing.process_batch(_docs(spark, [(1, _BASE), (2, _OTHER)]), 0)
    # epoch 1: near-dup of 1 (rejected) + new doc 4 (accepted)
    ing.process_batch(
        _docs(spark, [(3, _BASE + " tonight"), (4, _THIRD)]), 1
    )
    # epoch 2: near-dup of the REJECTED 3 ≈ accepted 1 → still a dup of 1;
    # plus an exact copy of 4 → dup of 4
    ing.process_batch(_docs(spark, [(5, _BASE + " today"), (6, _THIRD)]), 2)

    v = _verdicts(ing, spark)
    assert v[1] == (None, True, 0) and v[2] == (None, True, 0)
    assert v[3][0] == 1 and v[3][1] is False and v[3][2] == 1
    assert v[4] == (None, True, 1)
    assert v[5][0] == 1 and not v[5][1]
    assert v[6] == (4, False, 2)
    corpus_ids = {r["doc_id"] for r in ing.corpus.read(spark).collect()}
    assert corpus_ids == {1, 2, 4}
    # the index holds bands rows only for accepted docs
    idx_ids = {r["doc_id"] for r in ing.index.read(spark).collect()}
    assert idx_ids == {1, 2, 4}


def test_redelivered_epoch_lands_nothing_twice(spark, tmp_path):
    ing = NearDupIngest(str(tmp_path / "t"), threshold=0.5)
    b0 = _docs(spark, [(1, _BASE)])
    ing.process_batch(b0, 0)
    before = (
        ing.corpus.current_seq(),
        ing.index.current_seq(),
        ing.verdicts.current_seq(),
        ing.corpus.read(spark).count(),
    )
    ing.process_batch(b0, 0)  # foreachBatch retry of the same epoch
    after = (
        ing.corpus.current_seq(),
        ing.index.current_seq(),
        ing.verdicts.current_seq(),
        ing.corpus.read(spark).count(),
    )
    assert before == after
    assert _verdicts(ing, spark)[1] == (None, True, 0)


def test_partial_commit_retry_is_snapshot_isolated(spark, tmp_path):
    """A crash between the corpus append and the verdict append must not
    flip the recomputed verdicts: epoch 1's docs are already IN corpus on
    retry, but the as-of read excludes this epoch's own commits, so the doc
    does not match itself and is_new stays true."""
    ing = NearDupIngest(str(tmp_path / "t"), threshold=0.5)
    ing.process_batch(_docs(spark, [(1, _OTHER)]), 0)
    # simulate the partial epoch-1 commit: corpus + index appended, then
    # crash BEFORE the verdicts append
    b1 = _docs(spark, [(2, _BASE)])
    ing.corpus.append(
        b1, extra={"stream_query": ing.query_tag, "stream_epoch": 1}
    )
    ing.index.append(
        ing._index_of(b1), partition_by="band_id",
        extra={"stream_query": ing.query_tag, "stream_epoch": 1},
    )
    ing.process_batch(b1, 1)  # redelivery
    v = _verdicts(ing, spark)
    assert v[2] == (None, True, 1)  # NOT a dup of itself
    assert ing.corpus.read(spark).count() == 2  # no double append either


def test_stream_matches_serial_batch_replay(spark, tmp_path):
    """Verdicts from N micro-batches equal the serial replay of
    incremental_minhash_dedup with corpus = accepted-so-far."""
    rows = [
        (1, _BASE),
        (2, _OTHER),
        (3, _BASE.replace("children", "offspring")),
        (4, _OTHER + " extra trailing tokens beyond the base"),
        (5, _BASE.replace("fox", "wolf")),
        (6, "entirely new material about lighthouse keepers and tides "
            "rolling under a winter moon with gulls asleep on the pier"),
    ]
    batches = [rows[0:2], rows[2:4], rows[4:6]]
    ing = NearDupIngest(str(tmp_path / "t"), threshold=0.5)
    for e, b in enumerate(batches):
        ing.process_batch(_docs(spark, b), e)
    got = _verdicts(ing, spark)

    accepted: list = []
    expect = {}
    for e, b in enumerate(batches):
        inc = _docs(spark, b)
        if accepted:
            vs = incremental_minhash_dedup(
                _docs(spark, accepted), inc, threshold=0.5
            ).collect()
        else:
            vs = [
                {"doc_id": d, "dup_of": None, "is_new": True}
                for d, _ in b
            ]
        for r in vs:
            expect[r["doc_id"]] = (r["dup_of"], r["is_new"], e)
        accepted += [x for x in b if expect[x[0]][1]]
    assert got == expect


def test_compaction_between_epochs_preserves_verdicts(spark, tmp_path):
    """Table maintenance while ingesting: compacting the per-epoch small
    files of corpus and index between micro-batches must not change any
    later verdict (compaction is a bit-identical replace snapshot)."""
    rows01 = [(1, _BASE), (2, _OTHER)]
    rows2 = [(3, _BASE + " tonight"), (4, _THIRD)]

    plain = NearDupIngest(str(tmp_path / "plain"), threshold=0.5)
    comp = NearDupIngest(str(tmp_path / "comp"), threshold=0.5)
    for e, b in enumerate([rows01[:1], rows01[1:]]):
        plain.process_batch(_docs(spark, b), e)
        comp.process_batch(_docs(spark, b), e)
    comp.corpus.compact(spark)
    comp.index.compact(spark, target_files=2)
    plain.process_batch(_docs(spark, rows2), 2)
    comp.process_batch(_docs(spark, rows2), 2)
    assert _verdicts(plain, spark) == _verdicts(comp, spark)
    assert {r["doc_id"] for r in comp.corpus.read(spark).collect()} == {1, 2, 4}
