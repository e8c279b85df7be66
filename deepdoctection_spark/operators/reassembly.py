"""Conversation reassembly: the engine's only true cross-row operation.

All extraction is per-turn (narrow). Restoring deterministic conversation
order requires one shuffle on conv_id — the north rule's stable-ordering
contract. The reference's parallel maps are explicitly UNORDERED
(/root/reference/deepdoctection/dataflow/parallel_map.py:163-171); order there
is restored by single-threaded iteration, which cannot scale. Here order is
restored *declaratively*: sort keys travel with the data and a single
aggregation reassembles each conversation.

Scale notes (100 TB / 10^12 turns):
- The groupBy(conv_id) shuffle hash-partitions conversations; AQE coalesces
  small post-shuffle partitions and splits skewed ones.
- Mega-conversation skew: `salted_repartition` pre-spreads a hot conv_id over
  salt buckets for the narrow stage so no single input task drags; only the
  final reassembly touches conv granularity (SURVEY.md §4 design rule 1).
- array_sort(collect_list(struct(turn_idx, ...))) is used instead of a window
  + collect over ordered rows: one shuffle, no second sort pass, and the sort
  key is explicit in the data (never arrival order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepdoctection_spark.config import DEFAULT_CONFIG, PipelineConfig


def with_turn_order(extracted: DataFrame) -> DataFrame:
    """Attach a dense per-conversation position via the canonical window
    (Window.partitionBy(conv_id).orderBy(turn_idx)) — the cross-row analogue of
    the reference's reading_order sub-category
    (/root/reference/deepdoctection/pipe/order.py:566-772)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return extracted.withColumn("turn_order", F.row_number().over(w))


def reassemble_conversations(
    extracted: DataFrame, text_col: str = "extracted_text", sep: str = "\n\n"
) -> DataFrame:
    """One row per conversation: turns concatenated in turn_idx order.

    conv_text = join of per-turn extracted text, ordered by the explicit key —
    deterministic under any physical parallelism / arrival order.
    """
    return (
        extracted.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("turn_idx"), F.col(text_col)))
                    ),
                    lambda s: s[text_col],
                ),
                sep,
            ).alias("conv_text"),
        )
    )


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Spread skewed conv_ids across salt buckets for the narrow stages.

    repartition(N, conv_id, pmod(hash(turn_idx), SALT)) keeps a conversation's
    turns in at most SALT partitions while preventing one mega-conversation
    from serializing a stage (SURVEY.md §4 explicit-design rule 1). A no-op
    when cfg.skew_salt_buckets == 0 (AQE-only mode).
    """
    if cfg.skew_salt_buckets <= 0:
        return df.repartition(num_partitions, "conv_id")
    salt = F.pmod(F.hash("turn_idx"), F.lit(cfg.skew_salt_buckets))
    return df.repartition(num_partitions, F.col("conv_id"), salt)
