"""Analyzer facade: the reference's top-level entry point, Spark-first.

Mirrors `get_dd_analyzer()` / `analyzer.analyze(path=...)`
(/root/reference/deepdoctection/analyzer/dd.py:404-465,
pipe/doctectionpipe.py:206-232): config resolution → component selection →
lazy plan construction. A user of the reference maps 1:1:

    reference                               this engine
    ---------                               -----------
    analyzer = get_dd_analyzer(             analyzer = get_analyzer(
        config_overwrite=[...])                 config_overwrite={...})
    df = analyzer.analyze(path=p)           df = analyzer.analyze_path(spark, p)
    df.reset_state(); for page in df: ...   df is a DataFrame — any action runs it
    page.text / page.chunks                 extracted_text col / analyzer.chunks(df)

`analyze` returns a lazy DataFrame (plan construction only — the analogue of
the reference's zero-execution _build_pipe chain); execution happens at the
first action, optimized end-to-end by Catalyst rather than component by
component.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from deepdoctection_spark.config import DEFAULT_CONFIG, PipelineConfig
from deepdoctection_spark.operators.extraction import (
    block_spans,
    extract_transcripts,
)
from deepdoctection_spark.operators.reassembly import reassemble_conversations
from deepdoctection_spark.sources.transcripts import build_transcripts


@dataclass(frozen=True)
class Analyzer:
    """Configured, reusable extraction pipeline (immutable — the reference
    clones components for thread-safety, pipe/concurrency.py:118-124; an
    immutable plan builder needs no cloning)."""

    cfg: PipelineConfig
    with_words: bool = True

    def analyze(self, transcripts: DataFrame) -> DataFrame:
        """transcripts(conv_id, turn_idx, role, text, tool[, ts]) →
        per-turn extraction rows (lazy)."""
        return extract_transcripts(
            transcripts, cfg=self.cfg, with_words=self.with_words
        )

    def analyze_path(self, spark: SparkSession, path: str) -> DataFrame:
        """Parquet directory/file of transcripts → extraction rows — the
        analogue of analyze(path=...) source selection
        (doctectionpipe.py:142-163)."""
        return self.analyze(spark.read.parquet(path))

    def analyze_sf(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        """Driver-testdata convenience: synthesize transcripts from the
        documents table and analyze them."""
        return self.analyze(build_transcripts(spark, sf_dir))

    def chunks(self, extracted: DataFrame) -> DataFrame:
        """Flat span export — Page.chunks (view.py:733-764)."""
        return block_spans(extracted)

    def conversations(self, extracted: DataFrame) -> DataFrame:
        """Stable-order conversation texts — Page.text generalized across
        turns (view.py:660-678 + the north-rule turn window)."""
        return reassemble_conversations(extracted)

    # --- round-2 component surfaces (same lazy-DataFrame contract) --------

    def refined_tables(self, extracted: DataFrame) -> DataFrame:
        """Cell-merge refinement over noisy proposals —
        TableSegmentationRefinementService (pipe/refine.py:44-296)."""
        from deepdoctection_spark.operators.refineop import refined_tables

        return refined_tables(extracted)

    def nms_candidates(self, extracted: DataFrame) -> DataFrame:
        """Greedy NMS verdicts over synthesized proposals —
        AnnotationNmsService (pipe/common.py:239-301)."""
        from deepdoctection_spark.operators.matchnms import noisy_candidates

        return noisy_candidates(extracted)

    def match_assignments(self, extracted: DataFrame) -> DataFrame:
        """IoA-argmax child→parent matching — MatchingService
        (pipe/common.py:76-168)."""
        from deepdoctection_spark.operators.matchnms import noisy_assignments

        return noisy_assignments(extracted)

    def coco_map(self, spark: SparkSession, gt: DataFrame) -> DataFrame:
        """COCO mAP over gt block spans — eval/cocometric.py."""
        from deepdoctection_spark.operators.cocomap import eval_coco_map

        return eval_coco_map(spark, gt)

    # --- round-3 component surfaces ---------------------------------------

    def analyze_ice(
        self,
        spark: SparkSession,
        table_path: str,
        predicate=None,
        seq: int | None = None,
    ) -> DataFrame:
        """Extraction over an Iceberg-semantics snapshot read — the
        north-rule input shape. ``predicate`` (one (col, op, lit) triple or
        a conjunctive list) prunes data files at the manifest (partition
        values, Bloom sidecars, footer min/max) before Spark sees them;
        ``seq`` time-travels to a historical snapshot."""
        from deepdoctection_spark.sources.icetable import IceTable

        t = IceTable(table_path)
        src = t.scan(spark, predicate, seq) if predicate is not None else t.read(
            spark, seq=seq
        )
        return self.analyze(src)

    def dedup_conversations(
        self, extracted: DataFrame, near: bool = False, threshold: float = 0.8
    ) -> DataFrame:
        """Dedup over the extraction output. Exact (default): one row per
        reassembled conversation with (fingerprint, is_kept, group_size) —
        a fingerprint window, no pairwise scan. ``near=True``: MinHash-LSH
        candidate pairs verified by exact Jaccard ≥ threshold, the same
        operator that runs on raw documents."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from deepdoctection_spark.operators import dedup

        conv = self.conversations(extracted).select(
            F.col("conv_id").alias("doc_id"), F.col("conv_text").alias("text")
        )
        if near:
            return dedup.minhash_lsh_pairs(conv, threshold=threshold)
        w = Window.partitionBy("fingerprint")
        return (
            conv.select(
                "doc_id",
                F.md5(dedup.normalized_text(F.col("text"))).alias("fingerprint"),
            )
            .withColumn("is_kept", F.col("doc_id") == F.min("doc_id").over(w))
            .withColumn("group_size", F.count("*").over(w))
        )


def get_analyzer(
    config_overwrite: dict | None = None, with_words: bool = True
) -> Analyzer:
    """Build an analyzer from the default config + overrides — the
    get_dd_analyzer contract (dd.py:404-465: copy default YAML, apply
    `config_overwrite`, sanity-check)."""
    cfg = DEFAULT_CONFIG
    if config_overwrite:
        unknown = set(config_overwrite) - set(cfg.__dataclass_fields__)
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        cfg = replace(cfg, **config_overwrite)
    if not 0.0 <= cfg.link_density_threshold <= 1.0:
        raise ValueError("link_density_threshold must be in [0, 1]")
    if cfg.tag_density_threshold < 0.0:
        raise ValueError("tag_density_threshold must be >= 0")
    return Analyzer(cfg=cfg, with_words=with_words)
